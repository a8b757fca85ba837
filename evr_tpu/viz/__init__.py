from .projection import generate_visualization, project_embeddings

__all__ = ["generate_visualization", "project_embeddings"]

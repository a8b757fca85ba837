"""Built-in product UI static contract checks.

No browser or JS engine exists on this image (the same environmental
limit that prevents building the reference's React app), so the UI's JS
cannot be executed here. These tests catch the two classes of bugs a
browser drive would: (1) the script referencing a DOM id that the HTML
doesn't define, and (2) the script calling an API route the backend
doesn't serve. Field-level response contracts are covered by
tests/test_frontend_contract.py against the same endpoints the UI calls."""

import re

import pytest

werkzeug = pytest.importorskip("werkzeug")

from evr_tpu.serving.ui import INDEX_HTML


def _split_document():
    head, script = INDEX_HTML.split("<script>", 1)
    script = script.split("</script>", 1)[0]
    return head, script


def test_every_dom_id_the_script_uses_exists():
    html, script = _split_document()
    defined = set(re.findall(r'id="([^"]+)"', html))
    referenced = set(re.findall(r"\$\('([^']+)'\)", script))
    referenced |= set(re.findall(r"getElementById\('([^']+)'\)", script))
    missing = referenced - defined
    assert not missing, f"script references undefined DOM ids: {sorted(missing)}"


def test_every_api_url_the_script_calls_is_routed():
    _, script = _split_document()
    urls = set(re.findall(r"['\"](/api/[a-z\-]+[a-z])", script))
    urls |= {"/api/video/", "/api/frame/"}  # built dynamically in helpers
    assert urls, "no API calls found in the UI script?"

    # collect the app's route prefixes from the actual Rule map
    from evr_tpu.config import DataRootConfig
    from evr_tpu.index import EmbeddingEngine
    from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig
    from evr_tpu.serving import ServingContext, create_app
    import tempfile

    small = CLIPConfig(
        embed_dim=8,
        vision=VisionConfig(image_size=32, patch_size=16, width=16, layers=1, heads=2),
        text=TextConfig(width=16, layers=1, heads=2),
    )
    with tempfile.TemporaryDirectory() as td:
        app = create_app(
            ServingContext(
                DataRootConfig(td), engine=EmbeddingEngine(cfg=small, batch_size=2)
            )
        )
        routes = [r.rule for r in app.url_map.iter_rules()]
    for url in sorted(urls):
        ok = any(
            rule == url or rule.startswith(url) or url.startswith(rule.split("<")[0])
            for rule in routes
        )
        assert ok, f"UI calls unrouted endpoint: {url} (routes: {routes})"


def test_views_and_nav_are_consistent():
    html, script = _split_document()
    nav_views = set(re.findall(r'data-view="([^"]+)"', html))
    sections = set(re.findall(r'<section id="view-([^"]+)"', html))
    assert nav_views == sections == {"library", "search", "player", "viz"}


def test_all_search_methods_selectable():
    html, _ = _split_document()
    select = html.split('id="method"', 1)[1].split("</select>", 1)[0]
    methods = set(re.findall(r'value="([^"]+)"', select))
    assert methods >= {
        "text_adaptive", "text_clip", "keyword_only", "text_keyword",
        "object_only", "text_object", "text_object_keyword",
        "speech_only", "text_speech", "temporal", "video",
    }


def test_script_brace_balance():
    # cheap structural smoke: a truncated paste shows up as unbalanced
    _, script = _split_document()
    stripped = re.sub(r"'(?:\\.|[^'\\])*'|\"(?:\\.|[^\"\\])*\"|`(?:\\.|[^`\\])*`", "", script)
    stripped = re.sub(r"//[^\n]*", "", stripped)
    for a, b in ("{}", "()", "[]"):
        assert stripped.count(a) == stripped.count(b), f"unbalanced {a}{b}"

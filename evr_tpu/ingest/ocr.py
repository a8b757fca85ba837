"""Zero-egress OCR — the text half of the reference's frame annotator.

The reference fills each frame record's ``text_detections`` by running
EasyOCR (Vietnamese) per frame (`Backend/JSON_sample_DOC.py:29-57`), and
the keyword strategies match those labels by accent-folded substring
(`Backend/services/search_service.py:25-58`). EasyOCR is absent from this
zero-egress image, so until now a fresh ingest produced empty
``text_detections`` and ``keyword_only``/``text_keyword`` only matched
pre-annotated fixture data. This module closes that gap with a from-scratch
two-stage OCR pipeline whose recognizer is TPU-native JAX:

* **Detection** (host, OpenCV primitives only): gradient-magnitude map →
  Otsu threshold → wide horizontal morphological close (characters of one
  line fuse into a single component) → connected-component stats filtered
  by height/aspect/fill. Polarity-free (gradients ignore whether text is
  bright-on-dark subtitles or dark-on-bright captions).
* **Recognition** (device): a small CRNN-style conv tower over fixed
  [32, 256] grayscale line crops → per-width-position class logits →
  CTC greedy decode. Static shapes throughout — every crop batch compiles
  to ONE XLA program; convs ride the MXU.
* **Training** (device): CTC (``optax.ctc_loss``) on synthetic renders of
  a mixed lexicon (random character strings + English/Vietnamese words)
  drawn with the system DejaVu fonts, augmented with scale/pad/polarity/
  noise jitter. The dataset is pre-rendered once and kept device-resident;
  the train loop is a jitted ``lax.scan`` over minibatch indices — zero
  host↔device traffic per step (this environment's relay makes per-step
  H2D the bottleneck otherwise).

A trained checkpoint is committed at ``ingest/assets/ocr_ctc.npz`` so a
fresh ingest recognizes text with zero setup; retrain or extend with
``python -m evr_tpu.tools.train_ocr``. Accuracy is scoped honestly: this
is a synthetic-render-trained recognizer for overlay/subtitle-style text,
not an EasyOCR-parity scene-text model — the ``EasyOCRAnnotator`` adapter
remains the hot-swappable real-asset path (same policy as the tokenizer
fallbacks in `tokenizer/fallbacks.py`).
"""

from __future__ import annotations

import functools
import pathlib

import numpy as np

import jax
import jax.numpy as jnp

# class 0 is the CTC blank; class i+1 emits CHARSET[i]
CHARSET = (
    " abcdefghijklmnopqrstuvwxyz0123456789-.:!?'\""
    # Vietnamese lowercase (the reference OCR language)
    "àáảãạăằắẳẵặâầấẩẫậèéẻẽẹêềếểễệìíỉĩịòóỏõọôồốổỗộơờớởỡợ"
    "ùúủũụưừứửữựỳýỷỹỵđ"
)
BLANK_ID = 0

IMG_H, IMG_W = 32, 256
MAX_LABEL = 24

_ASSETS_DIR = pathlib.Path(__file__).parent / "assets"
DEFAULT_CHECKPOINT = _ASSETS_DIR / "ocr_ctc.npz"

_FONT_DIR = pathlib.Path("/usr/share/fonts/truetype/dejavu")
FONT_PATHS = tuple(
    str(_FONT_DIR / name)
    for name in (
        "DejaVuSans.ttf",
        "DejaVuSans-Bold.ttf",
        "DejaVuSerif.ttf",
        "DejaVuSansMono.ttf",
    )
    if (_FONT_DIR / name).exists()
)

# a compact seed lexicon: words the fixture corpus and its queries actually
# use (tags, violence-domain vocabulary, common English/Vietnamese words) —
# random strings in the training mix keep the model character-general, this
# list just concentrates probability mass on realistic shapes
LEXICON_WORDS = (
    "the and for with news live breaking video camera scene street night "
    "day man woman people crowd police fire fight fighting violence gun "
    "knife attack danger warning alert stop exit open closed sale free "
    "hello world test frame event action match goal score time date "
    "subscribe channel follow like share comment city road car bus "
    "tin tức an ninh cảnh sát bạo lực đánh nhau nguy hiểm cảnh báo "
    "dừng lại lối ra mở cửa đóng cửa miễn phí xin chào thế giới "
    "người đàn ông phụ nữ đám đông đường phố thành phố buổi tối"
).split()


def encode_label(text: str) -> list[int]:
    """text → CTC class ids (chars outside CHARSET are dropped)."""
    lut = {c: i + 1 for i, c in enumerate(CHARSET)}
    return [lut[c] for c in text.lower() if c in lut]


def decode_ids(ids) -> str:
    return "".join(CHARSET[i - 1] for i in ids if 0 < i <= len(CHARSET))


# -- synthetic render training data ------------------------------------------

def render_line(
    text: str,
    rng: np.random.Generator,
    font_path: str | None = None,
    augment: bool = True,
) -> np.ndarray:
    """Render one text line to a [IMG_H, IMG_W] float32 image in [0, 1]
    (text bright on dark — polarity augmentation flips it)."""
    from PIL import Image, ImageDraw, ImageFont

    font_path = font_path or FONT_PATHS[int(rng.integers(len(FONT_PATHS)))]
    size = int(rng.integers(18, 30)) if augment else 24
    font = ImageFont.truetype(font_path, size)
    x0, y0, x1, y1 = font.getbbox(text)
    w = max(1, x1 - x0)
    h = max(1, y1 - y0)
    pad = int(rng.integers(2, 8)) if augment else 4
    img = Image.new("L", (w + 2 * pad, h + 2 * pad), 0)
    ImageDraw.Draw(img).text((pad - x0, pad - y0), text, fill=255, font=font)
    arr = np.asarray(img, np.float32) / 255.0
    return stage_crop(arr, rng if augment else None)


def stage_crop(
    gray01: np.ndarray, rng: np.random.Generator | None = None
) -> np.ndarray:
    """Any-size [h, w] float line crop → the recognizer's fixed [IMG_H,
    IMG_W] input: height-normalised proportional resize, left-aligned,
    zero right-pad (or center-crop if over-wide). Optional augmentation:
    polarity flip, contrast jitter, additive noise."""
    import cv2

    h, w = gray01.shape
    scale = IMG_H / h
    new_w = max(1, min(IMG_W, int(round(w * scale))))
    out = cv2.resize(
        gray01.astype(np.float32), (new_w, IMG_H),
        interpolation=cv2.INTER_AREA if scale < 1 else cv2.INTER_LINEAR,
    )
    canvas = np.zeros((IMG_H, IMG_W), np.float32)
    canvas[:, :new_w] = out[:, :IMG_W]
    if rng is not None:
        if rng.random() < 0.5:
            canvas = canvas.max() - canvas  # polarity flip
        lo, hi = rng.uniform(0.0, 0.15), rng.uniform(0.75, 1.0)
        canvas = lo + canvas * (hi - lo)
        canvas = canvas + rng.normal(0, rng.uniform(0.01, 0.05), canvas.shape)
        canvas = np.clip(canvas, 0.0, 1.0).astype(np.float32)
    # per-crop standardisation: polarity/contrast handled by augmentation,
    # brightness/scale handled here
    canvas = canvas - canvas.mean()
    canvas = canvas / max(canvas.std(), 1e-5)
    return canvas.astype(np.float32)


def sample_text(rng: np.random.Generator) -> str:
    """Training-text sampler: words, short phrases, and random strings."""
    kind = rng.random()
    if kind < 0.45:  # lexicon word(s)
        n = int(rng.integers(1, 4))
        words = [
            LEXICON_WORDS[int(rng.integers(len(LEXICON_WORDS)))]
            for _ in range(n)
        ]
        text = " ".join(words)
    elif kind < 0.75:  # random letter string (character generality)
        n = int(rng.integers(2, 12))
        letters = CHARSET[1:37]  # a-z0-9
        text = "".join(letters[int(rng.integers(len(letters)))] for _ in range(n))
    else:  # random full-charset string incl. accents
        n = int(rng.integers(2, 10))
        text = "".join(
            CHARSET[int(rng.integers(1, len(CHARSET)))] for _ in range(n)
        )
    text = text.strip()[: MAX_LABEL]
    return text if text else "a"


def make_dataset(
    n: int, seed: int = 0
) -> tuple[np.ndarray, np.ndarray, np.ndarray, list[str]]:
    """Pre-render ``n`` (image, label) pairs: images [n, IMG_H, IMG_W, 1],
    labels [n, MAX_LABEL] (0-padded), label_paddings [n, MAX_LABEL]."""
    rng = np.random.default_rng(seed)
    imgs = np.zeros((n, IMG_H, IMG_W, 1), np.float32)
    labels = np.zeros((n, MAX_LABEL), np.int32)
    pads = np.ones((n, MAX_LABEL), np.float32)
    texts = []
    for i in range(n):
        text = sample_text(rng)
        ids = encode_label(text)[:MAX_LABEL]
        if not ids:
            text, ids = "a", encode_label("a")
        imgs[i, :, :, 0] = render_line(text, rng)
        labels[i, : len(ids)] = ids
        pads[i, : len(ids)] = 0.0
        texts.append(text)
    return imgs, labels, pads, texts


# -- recognizer model ---------------------------------------------------------

N_CLASSES = len(CHARSET) + 1
# conv tower: (out_ch, stride_h, stride_w); H 32→2, W 256→64
_CONV_PLAN = ((32, 2, 2), (64, 2, 2), (96, 2, 1), (128, 2, 1))
_SEQ_LEN = IMG_W // 4  # 64 width positions after the two stride-2-W convs
_SEQ_WIDTH = 256  # per-position feature width (2 * 128 collapsed height)


def init_ocr_params(rng: jax.Array) -> dict:
    keys = jax.random.split(rng, len(_CONV_PLAN) + 3)
    params: dict = {}
    c_in = 1
    for i, (c_out, _, _) in enumerate(_CONV_PLAN):
        fan = 3 * 3 * c_in
        params[f"conv{i}_w"] = (
            jax.random.normal(keys[i], (3, 3, c_in, c_out), jnp.float32)
            * (2.0 / fan) ** 0.5
        )
        params[f"conv{i}_b"] = jnp.zeros((c_out,), jnp.float32)
        c_in = c_out
    # width-context mixing conv (kernel 5 over the sequence axis)
    params["mix_w"] = (
        jax.random.normal(keys[-3], (5, _SEQ_WIDTH, _SEQ_WIDTH), jnp.float32)
        * (2.0 / (5 * _SEQ_WIDTH)) ** 0.5
    )
    params["mix_b"] = jnp.zeros((_SEQ_WIDTH,), jnp.float32)
    params["out_w"] = (
        jax.random.normal(keys[-2], (_SEQ_WIDTH, N_CLASSES), jnp.float32)
        * (1.0 / _SEQ_WIDTH) ** 0.5
    )
    params["out_b"] = jnp.zeros((N_CLASSES,), jnp.float32)
    return params


def ocr_logits(params: dict, images: jax.Array, dtype=jnp.float32) -> jax.Array:
    """[B, 32, 256, 1] float → [B, SEQ_LEN, N_CLASSES] fp32 logits."""
    x = images.astype(dtype)
    for i, (_, sh, sw) in enumerate(_CONV_PLAN):
        x = jax.lax.conv_general_dilated(
            x,
            params[f"conv{i}_w"].astype(dtype),
            window_strides=(sh, sw),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params[f"conv{i}_b"].astype(dtype)
        x = jax.nn.gelu(x)
    b = x.shape[0]
    # collapse the remaining height axis into per-position features
    x = x.transpose(0, 2, 1, 3).reshape(b, _SEQ_LEN, -1)  # [B, T, 2*128]
    x = jax.lax.conv_general_dilated(
        x,
        params["mix_w"].astype(dtype),
        window_strides=(1,),
        padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + params["mix_b"].astype(dtype)
    x = jax.nn.gelu(x)
    logits = x.astype(jnp.float32) @ params["out_w"] + params["out_b"]
    return logits  # CTC stays fp32 (loss/softmax fp32 convention)


def ctc_greedy_decode(
    logits: np.ndarray,
) -> tuple[list[str], np.ndarray]:
    """[B, T, C] logits → (texts, confidences). Confidence is the mean
    max-softmax over the non-blank emission frames (1.0-capped; 0 when the
    decode is empty)."""
    logits = np.asarray(logits, np.float32)
    ids = logits.argmax(axis=2)  # [B, T]
    z = logits - logits.max(axis=2, keepdims=True)
    probs = np.exp(z)
    probs /= probs.sum(axis=2, keepdims=True)
    top = probs.max(axis=2)  # [B, T]
    texts, confs = [], []
    for row_ids, row_top in zip(ids, top):
        out, conf_frames, prev = [], [], BLANK_ID
        for t, i in enumerate(row_ids):
            if i != BLANK_ID and i != prev:
                out.append(int(i))
                conf_frames.append(float(row_top[t]))
            prev = int(i)
        texts.append(decode_ids(out))
        confs.append(float(np.mean(conf_frames)) if conf_frames else 0.0)
    return texts, np.asarray(confs, np.float32)


# -- training ------------------------------------------------------------------

def train_ocr(
    steps: int = 3000,
    batch: int = 64,
    dataset_size: int = 8192,
    lr: float = 1e-3,
    seed: int = 0,
    params: dict | None = None,
    log_every: int = 0,
) -> tuple[dict, dict]:
    """Train the recognizer on device-resident synthetic renders.

    The dataset is rendered once on the host and moved to the device once;
    training runs as jitted chunks of ``lax.scan`` steps over shuffled
    minibatch indices — no per-step host↔device traffic (the relay rule).
    Returns (params, {"loss": final_mean_loss, "acc": held-out exact-match
    accuracy})."""
    import optax

    imgs, labels, pads, _ = make_dataset(dataset_size, seed=seed)
    x = jnp.asarray(imgs)
    y = jnp.asarray(labels)
    yp = jnp.asarray(pads)

    if params is None:
        params = init_ocr_params(jax.random.PRNGKey(seed))
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(
            optax.warmup_cosine_decay_schedule(
                0.0, lr, min(100, max(1, steps // 10)), steps, lr * 0.05
            )
        ),
    )
    opt_state = tx.init(params)

    def loss_fn(p, bx, by, byp):
        logits = ocr_logits(p, bx)
        lp = jnp.zeros(logits.shape[:2], jnp.float32)  # no logit padding
        return optax.ctc_loss(logits, lp, by, byp, blank_id=BLANK_ID).mean()

    # the dataset is a jit ARGUMENT, never a closure: closed-over device
    # arrays become jaxpr constants and wedge this environment's remote
    # compiler on hundreds of MB (CLAUDE.md rule)
    @jax.jit
    def run_chunk(p, s, xd, yd, ypd, chunk_idx):
        def step(carry, idx):
            p_, s_ = carry
            loss, grads = jax.value_and_grad(loss_fn)(
                p_, xd[idx], yd[idx], ypd[idx]
            )
            updates, s_ = tx.update(grads, s_, p_)
            return (optax.apply_updates(p_, updates), s_), loss

        (p, s), losses = jax.lax.scan(step, (p, s), chunk_idx)
        return p, s, losses

    rng = np.random.default_rng(seed + 1)
    chunk = 100
    losses_all = []
    done = 0
    while done < steps:
        k = min(chunk, steps - done)
        idx = rng.integers(0, dataset_size, size=(k, batch))
        params, opt_state, losses = run_chunk(
            params, opt_state, x, y, yp, jnp.asarray(idx)
        )
        losses_all.append(np.asarray(losses))
        done += k
        if log_every and (done % log_every == 0 or done == steps):
            print(f"step {done}/{steps} loss {float(np.mean(losses_all[-1])):.4f}")

    acc = eval_ocr(params, n=256, seed=seed + 99)
    return params, {
        "loss": float(np.mean(losses_all[-1])),
        "acc": acc,
    }


def eval_ocr(params: dict, n: int = 256, seed: int = 123) -> float:
    """Exact-match accuracy on fresh (unseen-seed) synthetic renders."""
    imgs, _, _, texts = make_dataset(n, seed=seed)
    logits = _batched_logits(params, imgs)
    decoded, _ = ctc_greedy_decode(logits)
    return float(np.mean([d == t for d, t in zip(decoded, texts)]))


@functools.partial(jax.jit, static_argnames=())
def _logits_jit(params, images):
    return ocr_logits(params, images)


def _batched_logits(
    params: dict, imgs: np.ndarray, batch: int = 64
) -> np.ndarray:
    out = []
    for i in range(0, len(imgs), batch):
        chunkx = imgs[i : i + batch]
        n = len(chunkx)
        if n < batch:  # static shapes: pad the tail batch
            chunkx = np.concatenate(
                [chunkx, np.zeros((batch - n, *chunkx.shape[1:]), chunkx.dtype)]
            )
        out.append(np.asarray(_logits_jit(params, jnp.asarray(chunkx)))[:n])
    return (
        np.concatenate(out)
        if out
        else np.zeros((0, _SEQ_LEN, N_CLASSES), np.float32)
    )


def save_checkpoint(params: dict, path=DEFAULT_CHECKPOINT, meta: dict | None = None):
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = {k: np.asarray(v, np.float32) for k, v in params.items()}
    flat["__charset__"] = np.frombuffer(
        CHARSET.encode("utf-8"), np.uint8
    ).copy()
    if meta:
        import json

        flat["__meta__"] = np.frombuffer(
            json.dumps(meta).encode("utf-8"), np.uint8
        ).copy()
    np.savez_compressed(path, **flat)


def load_checkpoint(path=DEFAULT_CHECKPOINT) -> dict:
    path = pathlib.Path(path)
    if not path.exists():
        raise FileNotFoundError(
            f"OCR checkpoint {path} not found — train one with "
            "`python -m evr_tpu.tools.train_ocr` (synthetic renders, no "
            "downloads needed)"
        )
    with np.load(path) as z:
        saved = z["__charset__"].tobytes().decode("utf-8")
        if saved != CHARSET:
            raise ValueError(
                "checkpoint charset differs from ingest.ocr.CHARSET — "
                "retrain or pin the matching code version"
            )
        return {
            k: jnp.asarray(z[k])
            for k in z.files
            if not k.startswith("__")
        }


# -- detection -----------------------------------------------------------------

def detect_text_regions(
    gray_u8: np.ndarray,
    min_height: int = 10,
    max_height_frac: float = 0.35,
    min_aspect: float = 1.2,
    max_aspect: float = 40.0,
    min_fill: float = 0.15,
    max_regions: int = 8,
) -> list[tuple[int, int, int, int]]:
    """Text-line candidate boxes (x, y, w, h in pixels) from one grayscale
    frame. Gradient magnitude → Otsu threshold → wide horizontal close →
    connected components filtered by line-like geometry. Polarity-free."""
    import cv2

    h, w = gray_u8.shape
    # pre-blur kills per-pixel sensor/compression noise before the
    # gradient; text edges are multi-pixel steps and survive it
    smooth = cv2.GaussianBlur(gray_u8, (3, 3), 0)
    gx = cv2.Sobel(smooth, cv2.CV_32F, 1, 0, ksize=3)
    gy = cv2.Sobel(smooth, cv2.CV_32F, 0, 1, ksize=3)
    mag = cv2.convertScaleAbs(np.sqrt(gx * gx + gy * gy))
    _, binary = cv2.threshold(mag, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    # fuse characters of a line into one component
    kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (15, 3))
    closed = cv2.morphologyEx(binary, cv2.MORPH_CLOSE, kernel)
    n, _, stats, _ = cv2.connectedComponentsWithStats(closed, connectivity=8)
    boxes = []
    for i in range(1, n):
        x, y, bw, bh, area = stats[i]
        if bh < min_height or bh > h * max_height_frac:
            continue
        aspect = bw / max(bh, 1)
        if not (min_aspect <= aspect <= max_aspect):
            continue
        if area / max(bw * bh, 1) < min_fill:
            continue
        boxes.append((int(x), int(y), int(bw), int(bh), int(area)))
    # largest-area candidates first, bounded (static-ish downstream batches)
    boxes.sort(key=lambda b: -b[4])
    return [(x, y, bw, bh) for x, y, bw, bh, _ in boxes[:max_regions]]


# -- the Annotator -------------------------------------------------------------

class LocalOCRAnnotator:
    """Zero-egress OCR annotator in the reference's detection schema
    (`ingest/annotate.py`: label / bounding_box [x,y,w,h normalised] /
    confidence) — the text-side sibling of `ZeroShotObjectAnnotator`.

    Per frame: host detection proposes line boxes, every crop is staged to
    the recognizer's fixed input and the whole folder's crops run through
    ONE jitted conv tower in device batches (``annotate_batch``). Decodes
    shorter than ``min_chars`` or below ``min_conf`` are dropped."""

    def __init__(
        self,
        params: dict | None = None,
        checkpoint=DEFAULT_CHECKPOINT,
        min_conf: float = 0.35,
        min_chars: int = 2,
        max_regions: int = 8,
        batch: int = 64,
    ):
        self.params = params if params is not None else load_checkpoint(checkpoint)
        self.min_conf = min_conf
        self.min_chars = min_chars
        self.max_regions = max_regions
        self.batch = batch

    def _frame_crops(self, gray_u8: np.ndarray):
        boxes = detect_text_regions(gray_u8, max_regions=self.max_regions)
        h, w = gray_u8.shape
        crops = []
        for x, y, bw, bh in boxes:
            # connected components hug the stroke gradient tightly; a small
            # proportional margin keeps the first/last glyph's outer edge
            # inside the crop (measured: tight crops drop leading thin
            # letters like 'f')
            m = max(2, bh // 8)
            x0, y0 = max(0, x - m), max(0, y - m)
            x1, y1 = min(w, x + bw + m), min(h, y + bh + m)
            crops.append(
                stage_crop(gray_u8[y0:y1, x0:x1].astype(np.float32) / 255.0)
            )
        return boxes, crops

    def _emit(self, boxes, texts, confs, width, height):
        dets = []
        for (x, y, bw, bh), text, conf in zip(boxes, texts, confs):
            text = text.strip()
            if len(text) < self.min_chars or conf < self.min_conf:
                continue
            dets.append(
                {
                    "label": text,
                    "bounding_box": [
                        x / width, y / height, bw / width, bh / height
                    ],
                    "confidence": round(float(conf), 4),
                }
            )
        return dets

    def annotate_batch(self, paths) -> list[dict]:
        import cv2

        all_crops, spans, shapes = [], [], []
        for p in paths:
            img = cv2.imread(str(p), cv2.IMREAD_GRAYSCALE)
            if img is None:
                spans.append(None)
                shapes.append(None)
                continue
            boxes, crops = self._frame_crops(img)
            spans.append((len(all_crops), len(all_crops) + len(crops), boxes))
            shapes.append(img.shape)
            all_crops.extend(crops)
        if all_crops:
            stacked = np.stack(all_crops)[..., None]
            logits = _batched_logits(self.params, stacked, batch=self.batch)
            texts, confs = ctc_greedy_decode(logits)
        else:
            texts, confs = [], np.zeros((0,), np.float32)
        results = []
        for span, shape in zip(spans, shapes):
            if span is None:
                results.append(
                    {"text_detections": [], "object_detections": []}
                )
                continue
            lo, hi, boxes = span
            h, w = shape
            results.append(
                {
                    "text_detections": self._emit(
                        boxes, texts[lo:hi], confs[lo:hi], w, h
                    ),
                    "object_detections": [],
                }
            )
        return results

    def __call__(self, image_path) -> dict:
        (out,) = self.annotate_batch([image_path])
        return out

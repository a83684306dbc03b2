"""AOT serving bundles: exported eval-mode forwards + weights in one file.

The reference has no serving layer at all (SURVEY §1: flat research repo,
no deployment path); this is the TPU-native production extension. A
trained checkpoint is ahead-of-time exported with :mod:`jax.export` to
serialized StableHLO artifacts — one per (batch, padded scene-size)
bucket, the same static-shape strategy the evaluation stack uses
(evaluation.py) — and bundled with the weights:

    bundle.zip
      meta.json            buckets, batch sizes, weight dtype, model type,
                           band counts, jax version
      variables.npz        flattened {params, batch_stats} leaves
                           (bf16 leaves stored as uint16 views)
      fwd_{h}x{w}.jaxexp        batch-1 artifact: (leaves..., x1, x2) -> probs
      fwd_b{b}_{h}x{w}.jaxexp   batch-b artifacts (b > 1)

Because the exported functions take the weight leaves as a FLAT LIST
(the pytree structure is baked into the traced graph at export time),
loading a bundle needs only jax + numpy — no flax, no model code, no
config system — which is exactly what a lean serving container wants.
Artifacts can be exported for multiple platforms (e.g. ("tpu", "cpu")) so
one bundle serves both.

Options:
  * ``weights_dtype='bf16'`` stores float32 leaves rounded to bfloat16 —
    half the bundle size (54.8 -> ~27 MB for the flagship; the compute
    path is bf16 anyway, so serving numerics see only the one-time weight
    rounding). Lossless default: 'fp32'.
  * ``batch_sizes=(1, 8)`` additionally exports batched forwards so bulk
    scoring amortizes per-dispatch overhead the way evaluation's
    group-of-8 batching does (BASELINE.md: 71.4 vs 39.2 scenes/s at
    group 8 vs 4); ``predict_batch`` routes through them.

``ServingModel.predict`` routes a scene to the smallest bucket that fits,
zero-pads, runs the artifact, and crops back — mirroring
evaluation.scene_probabilities so served probabilities match the
assessment pipeline bit-for-bit on bucket-sized scenes.
"""

from __future__ import annotations

import io
import json
import zipfile
from pathlib import Path

import jax
import numpy as np
from jax import export as jax_export

DEFAULT_BUCKETS = ((256, 256), (512, 512), (1024, 1024))


def _bf16():
    import ml_dtypes  # a jax dependency; present wherever jax is

    return np.dtype(ml_dtypes.bfloat16)


def _eval_fn(model, treedef):
    """Eval forward over the FLAT weight-leaf list; the pytree structure is
    closed over here and thus baked into the exported graph. Delegates to
    train_lib.eval_forward so the head-selection + sigmoid protocol has ONE
    source — served probabilities match the assessment pipeline by
    construction (the inner jit inlines under the exporting jit)."""
    from .train_lib import eval_forward

    def fwd(leaf_list, x1, x2):
        variables = jax.tree_util.tree_unflatten(treedef, leaf_list)
        return eval_forward(model, variables["params"],
                            variables.get("batch_stats", {}), x1, x2)

    return fwd


def _artifact_name(b: int, h: int, w: int) -> str:
    return f"fwd_{h}x{w}.jaxexp" if b == 1 else f"fwd_b{b}_{h}x{w}.jaxexp"


def export_serving_bundle(model, state, cfg, path,
                          buckets=DEFAULT_BUCKETS,
                          platforms=None,
                          weights_dtype: str = "fp32",
                          batch_sizes=(1,)) -> Path:
    """Export ``state``'s eval forward for each ``(h, w)`` bucket x batch
    size into a self-contained serving bundle at ``path``."""
    if weights_dtype not in ("fp32", "bf16"):
        raise ValueError(f"weights_dtype must be fp32|bf16, got {weights_dtype!r}")
    # batch 1 is always exported: predict() routes through it
    batch_sizes = sorted(set(int(b) for b in batch_sizes) | {1})
    if batch_sizes[0] < 1:
        raise ValueError(f"batch_sizes must be positive, got {batch_sizes}")

    variables = jax.device_get({"params": state.params,
                                "batch_stats": state.batch_stats})
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    leaves = [np.asarray(l) for l in leaves]
    if weights_dtype == "bf16":
        leaves = [l.astype(_bf16()) if l.dtype == np.float32 else l
                  for l in leaves]

    fwd = _eval_fn(model, treedef)

    n_ch = (len(cfg.DATALOADER.S1_BANDS), len(cfg.DATALOADER.S2_BANDS))
    in_channels = {"s1": n_ch[0], "s2": n_ch[1],
                   "s1s2": n_ch[0] + n_ch[1]}[cfg.DATALOADER.INPUT_MODE]

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    kwargs = {}
    if platforms is not None:
        if isinstance(platforms, str):  # tuple("cpu") would be ('c','p','u')
            platforms = [platforms]
        kwargs["platforms"] = tuple(platforms)

    leaf_specs = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves]
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for h, w in buckets:
            for b in batch_sizes:
                spec = jax.ShapeDtypeStruct((b, h, w, in_channels), np.float32)
                exported = jax_export.export(jax.jit(fwd), **kwargs)(
                    leaf_specs, spec, spec)
                z.writestr(_artifact_name(b, h, w), exported.serialize())

        buf = io.BytesIO()
        # bf16 leaves ride as uint16 bit patterns: np.savez cannot persist
        # the custom ml_dtypes dtype, the loader views them back
        np.savez(buf, *[l.view(np.uint16) if l.dtype == _bf16() else l
                        for l in leaves])
        z.writestr("variables.npz", buf.getvalue())
        z.writestr("meta.json", json.dumps({
            "buckets": [list(b) for b in buckets],
            "batch_sizes": batch_sizes,
            "weights_dtype": weights_dtype,
            "bf16_leaves": [i for i, l in enumerate(leaves)
                            if l.dtype == _bf16()],
            "model_type": cfg.MODEL.TYPE,
            "input_mode": cfg.DATALOADER.INPUT_MODE,
            "in_channels": in_channels,
            "jax_version": jax.__version__,
        }))
    return path


class ServingModel:
    """A loaded serving bundle. ``predict(x_t1, x_t2)`` takes (H, W, C)
    float scenes and returns (H, W) change probabilities; ``predict_batch``
    scores many scene pairs through the batched artifacts."""

    def __init__(self, path):
        self._path = Path(path)
        try:
            with zipfile.ZipFile(self._path) as z:
                self._load(z)
        except FileNotFoundError:
            raise
        except Exception as e:
            # name the bundle: zipfile/json/npz raise member- or
            # format-level errors that don't identify the file
            raise ValueError(
                f"Corrupt or incompatible serving bundle {self._path}: "
                f"{type(e).__name__}: {e}") from e
        self._fns: dict = {}

    def _load(self, z):
        meta = json.loads(z.read("meta.json"))
        npz = np.load(io.BytesIO(z.read("variables.npz")))
        bf16_leaves = set(meta.get("bf16_leaves", []))
        self.leaves = [
            npz[k].view(_bf16()) if i in bf16_leaves else npz[k]
            for i, k in enumerate(npz.files)]
        self.meta = meta
        self.buckets = sorted(tuple(b) for b in meta["buckets"])
        self.batch_sizes = sorted(meta.get("batch_sizes", [1]))

    def _fn(self, key):
        # artifacts are read + deserialized lazily per (b, h, w) key on
        # first use, and the raw bytes are not retained — a predict()-only
        # consumer never pays load time or memory for the batched or
        # other-bucket artifacts
        if key not in self._fns:
            b, bh, bw = key
            with zipfile.ZipFile(self._path) as z:
                self._fns[key] = jax_export.deserialize(
                    z.read(_artifact_name(b, bh, bw)))
        return self._fns[key]

    def _bucket_for(self, h, w):
        fits = [(bh * bw, bh, bw) for bh, bw in self.buckets
                if bh >= h and bw >= w]
        if not fits:
            raise ValueError(
                f"scene {h}x{w} exceeds every exported bucket "
                f"{self.buckets}; re-export with a larger bucket")
        _, bh, bw = min(fits)  # least padded area among the fitting buckets
        return bh, bw

    def _check_pair(self, x_t1, x_t2):
        if np.ndim(x_t1) != 3:
            raise ValueError(f"expected an unbatched (H, W, C) scene, got "
                             f"shape {np.shape(x_t1)}")
        h, w, c = x_t1.shape
        if x_t2.shape != x_t1.shape:
            raise ValueError(f"bitemporal shapes differ: x_t1 {x_t1.shape} "
                             f"vs x_t2 {x_t2.shape}")
        if c != self.meta["in_channels"]:
            raise ValueError(f"expected {self.meta['in_channels']} channels "
                             f"({self.meta['input_mode']}), got {c}")
        return h, w

    def predict(self, x_t1: np.ndarray, x_t2: np.ndarray) -> np.ndarray:
        h, w = self._check_pair(x_t1, x_t2)
        bh, bw = self._bucket_for(h, w)
        pad = lambda a: np.pad(np.asarray(a, np.float32),
                               ((0, bh - h), (0, bw - w), (0, 0)))[None]
        fn = self._fn((1, bh, bw))
        probs = fn.call(self.leaves, pad(x_t1), pad(x_t2))
        return np.asarray(probs)[0, :h, :w, 0]

    def predict_batch(self, pairs) -> list:
        """Score ``[(x_t1, x_t2), ...]`` scene pairs; returns per-pair (H, W)
        probability arrays in input order. Pairs sharing a size bucket are
        stacked and run through the largest exported batch artifact that
        fits (a partial final chunk is zero-padded on the batch axis), so
        bulk scoring amortizes per-dispatch overhead like evaluation's
        grouped forward does."""
        results: list = [None] * len(pairs)
        groups: dict = {}
        for i, (x1, x2) in enumerate(pairs):
            h, w = self._check_pair(x1, x2)
            groups.setdefault(self._bucket_for(h, w), []).append((i, x1, x2))

        max_b = self.batch_sizes[-1]
        for (bh, bw), members in groups.items():
            for start in range(0, len(members), max_b):
                chunk = members[start:start + max_b]
                # smallest exported batch that holds the chunk (a chunk is
                # at most max_b long by construction)
                b = next(b for b in self.batch_sizes if b >= len(chunk))
                x1 = np.zeros((b, bh, bw, self.meta["in_channels"]), np.float32)
                x2 = np.zeros_like(x1)
                for j, (_, a1, a2) in enumerate(chunk):
                    h, w = a1.shape[:2]
                    # direct slice assignment: the buffer is already zeroed,
                    # so padding each scene into a full-bucket temporary
                    # first would only double the copy work
                    x1[j, :h, :w] = a1
                    x2[j, :h, :w] = a2
                probs = np.asarray(
                    self._fn((b, bh, bw)).call(self.leaves, x1, x2))
                for j, (idx, a1, _) in enumerate(chunk):
                    h, w = a1.shape[:2]
                    results[idx] = probs[j, :h, :w, 0]
        return results


def load_serving_bundle(path) -> ServingModel:
    return ServingModel(path)

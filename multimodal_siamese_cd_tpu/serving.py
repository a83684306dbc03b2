"""AOT serving bundles: exported eval-mode forwards + weights in one file.

The reference has no serving layer at all (SURVEY §1: flat research repo,
no deployment path); this is the TPU-native production extension. A
trained checkpoint is ahead-of-time exported with :mod:`jax.export` to
serialized StableHLO artifacts — one per padded scene-size bucket, the
same static-shape strategy the evaluation stack uses (evaluation.py) —
and bundled with the weights:

    bundle.zip
      meta.json            buckets, model type, band counts, jax version
      variables.npz        flattened {params, batch_stats} leaves
      fwd_{h}x{w}.jaxexp   jax.export artifact: (leaves..., x1, x2) -> probs

Because the exported functions take the weight leaves as a FLAT LIST
(the pytree structure is baked into the traced graph at export time),
loading a bundle needs only jax + numpy — no flax, no model code, no
config system — which is exactly what a lean serving container wants.
Artifacts can be exported for multiple platforms (e.g. ("tpu", "cpu")) so
one bundle serves both.

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


def _eval_fn(model, treedef):
    """Eval forward over the FLAT weight-leaf list; the pytree structure is
    closed over here and thus baked into the exported graph."""
    def fwd(leaf_list, x1, x2):
        variables = jax.tree_util.tree_unflatten(treedef, leaf_list)
        out = model.apply(variables, x1, x2, train=False)
        if isinstance(out, tuple):
            out = out[0]
        return jax.nn.sigmoid(out)

    return fwd


def export_serving_bundle(model, state, cfg, path,
                          buckets=DEFAULT_BUCKETS,
                          platforms=None) -> Path:
    """Export ``state``'s eval forward for each ``(h, w)`` bucket into a
    self-contained serving bundle at ``path``."""
    variables = jax.device_get({"params": state.params,
                                "batch_stats": state.batch_stats})
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    leaves = [np.asarray(l) for l in leaves]

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

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for h, w in buckets:
            spec = jax.ShapeDtypeStruct((1, h, w, in_channels), np.float32)
            leaf_specs = [jax.ShapeDtypeStruct(l.shape, l.dtype)
                          for l in leaves]
            exported = jax_export.export(jax.jit(fwd), **kwargs)(
                leaf_specs, spec, spec)
            z.writestr(f"fwd_{h}x{w}.jaxexp", exported.serialize())

        buf = io.BytesIO()
        np.savez(buf, *leaves)
        z.writestr("variables.npz", buf.getvalue())
        z.writestr("meta.json", json.dumps({
            "buckets": [list(b) for b in buckets],
            "model_type": cfg.MODEL.TYPE,
            "input_mode": cfg.DATALOADER.INPUT_MODE,
            "in_channels": in_channels,
            "jax_version": jax.__version__,
        }))
    return path


class ServingModel:
    """A loaded serving bundle. ``predict(x_t1, x_t2)`` takes (H, W, C)
    float scenes and returns (H, W) change probabilities."""

    def __init__(self, path):
        with zipfile.ZipFile(Path(path)) as z:
            meta = json.loads(z.read("meta.json"))
            npz = np.load(io.BytesIO(z.read("variables.npz")))
            self.leaves = [npz[k] for k in npz.files]
            self.meta = meta
            self.buckets = sorted(tuple(b) for b in meta["buckets"])
            self._fns = {
                tuple(b): jax_export.deserialize(
                    z.read(f"fwd_{b[0]}x{b[1]}.jaxexp"))
                for b in meta["buckets"]}

    def _bucket_for(self, h, w):
        fits = [(bh * bw, bh, bw) for bh, bw in self.buckets
                if bh >= h and bw >= w]
        if not fits:
            raise ValueError(
                f"scene {h}x{w} exceeds every exported bucket "
                f"{self.buckets}; re-export with a larger bucket")
        _, bh, bw = min(fits)  # least padded area among the fitting buckets
        return bh, bw

    def predict(self, x_t1: np.ndarray, x_t2: np.ndarray) -> np.ndarray:
        h, w, c = x_t1.shape
        if x_t2.shape != x_t1.shape:
            raise ValueError(f"bitemporal shapes differ: x_t1 {x_t1.shape} "
                             f"vs x_t2 {x_t2.shape}")
        if c != self.meta["in_channels"]:
            raise ValueError(f"expected {self.meta['in_channels']} channels "
                             f"({self.meta['input_mode']}), got {c}")
        bh, bw = self._bucket_for(h, w)
        pad = lambda a: np.pad(np.asarray(a, np.float32),
                               ((0, bh - h), (0, bw - w), (0, 0)))[None]
        fn = self._fns[(bh, bw)]
        probs = fn.call(self.leaves, pad(x_t1), pad(x_t2))
        return np.asarray(probs)[0, :h, :w, 0]


def load_serving_bundle(path) -> ServingModel:
    return ServingModel(path)

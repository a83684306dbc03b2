"""Convert checkpoints between this framework and the PyTorch reference,
in both directions (import: torch -> flax; export: flax -> torch).

The reference (utils/networks.py) trains torch modules whose ``state_dict``
keys follow a fixed grammar — ``inc.conv.conv.0.weight``,
``encoder.down_seq.down1.mpconv.1.conv.3.bias``,
``decoder.up_seq.up2.up.weight``, ``outc.conv.weight`` … — for every factory
model type (networks.py:59-310 over the shared blocks :313-461). This module
translates such a state_dict into the flax ``{'params', 'batch_stats'}``
variables produced by :func:`..models.factory.create_network` +
``init_variables``, so users migrating from the reference can load their
trained torch weights directly.

Layout conversions (verified numerically against torch 2.x):

  * Conv2d      ``[O, I, kh, kw]``   -> flax ``[kh, kw, I, O]``
  * ConvTransp. ``[I, O, kh, kw]``   -> flax ``[kh, kw, I, O]`` **with the
    spatial taps flipped** (torch's transposed conv correlates with the
    un-flipped kernel; ``lax.conv_transpose`` convolves)
  * BatchNorm   weight/bias          -> params scale/bias
                running_mean/var     -> batch_stats mean/var
                num_batches_tracked  -> dropped (flax keeps no step counter)

The translation is structural, so it covers all six reference factory types
(unet, dualstreamunet, siameseunet, dtsiameseunet, whatevernet, whatevernet2)
without per-model tables: top-level attribute names are identical between the
torch classes and the flax modules by design.
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np

# torch Sequential index inside DoubleConv -> flax submodule name
# (conv, BN, ReLU, conv, BN, ReLU) == indices 0, 1, 3, 4 (networks.py:392-398)
_DOUBLECONV_UNITS = {"0": "conv1", "1": "bn1", "3": "conv2", "4": "bn2"}

_BN_LEAVES = {
    "weight": ("params", "scale"),
    "bias": ("params", "bias"),
    "running_mean": ("batch_stats", "mean"),
    "running_var": ("batch_stats", "var"),
}


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor, without importing torch here
        v = v.detach().cpu().numpy()
    # Always copy: tensor.numpy() shares memory with the live torch tensor,
    # and the JAX CPU backend can zero-copy host arrays — without this, a
    # later in-place torch update (e.g. BN running stats during a train-mode
    # forward) would silently mutate the ported flax variables.
    return np.array(v, copy=True)


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv2d [O, I, kh, kw] -> flax [kh, kw, I, O]."""
    return w.transpose(2, 3, 1, 0)


def _conv_transpose_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d [I, O, kh, kw] -> flax [kh, kw, I, O], spatially
    flipped (see module docstring)."""
    return w.transpose(2, 3, 0, 1)[::-1, ::-1]


def _translate_key(key: str):
    """Map one reference state_dict key to
    ``(collection, flax_path_tuple, transform)`` or ``None`` to drop it."""
    parts = key.split(".")
    top, rest = parts[0], parts[1:]
    leaf = rest[-1]
    if leaf == "num_batches_tracked":
        return None

    def double_conv(prefix, seq_idx):
        unit = _DOUBLECONV_UNITS[seq_idx]
        if unit.startswith("bn"):
            coll, name = _BN_LEAVES[leaf]
            return coll, prefix + (unit, name), lambda w: w
        name = "kernel" if leaf == "weight" else "bias"
        fn = _conv_kernel if leaf == "weight" else (lambda w: w)
        return "params", prefix + (unit, name), fn

    # InConv:  <top>.conv.conv.<j>.<leaf>      (networks.py:405-412)
    if rest[:2] == ["conv", "conv"] and len(rest) == 4:
        return double_conv((top, "conv"), rest[2])
    # Encoder: <top>.down_seq.down<i>.mpconv.1.conv.<j>.<leaf>  (:415-426)
    m = re.fullmatch(r"down_seq\.(down\d+)\.mpconv\.1\.conv\.(\d)\.\w+",
                     ".".join(rest))
    if m:
        return double_conv((top, m.group(1), "conv"), m.group(2))
    # Decoder upsample: <top>.up_seq.up<i>.up.<leaf>   (:429-436)
    m = re.fullmatch(r"up_seq\.(up\d+)\.up\.\w+", ".".join(rest))
    if m:
        name = "kernel" if leaf == "weight" else "bias"
        fn = _conv_transpose_kernel if leaf == "weight" else (lambda w: w)
        return "params", (top, m.group(1), "up", name), fn
    # Decoder DoubleConv: <top>.up_seq.up<i>.conv.conv.<j>.<leaf>
    m = re.fullmatch(r"up_seq\.(up\d+)\.conv\.conv\.(\d)\.\w+", ".".join(rest))
    if m:
        return double_conv((top, m.group(1), "conv"), m.group(2))
    # OutConv: <top>.conv.<leaf>   (:454-461)
    if rest[:1] == ["conv"] and len(rest) == 2:
        name = "kernel" if leaf == "weight" else "bias"
        fn = _conv_kernel if leaf == "weight" else (lambda w: w)
        return "params", (top, "conv", name), fn
    raise KeyError(f"unrecognized reference state_dict key: {key!r}")


def port_reference_state_dict(state_dict, variables):
    """Fill flax ``variables`` (as returned by ``init_variables``) with the
    weights of a reference torch ``state_dict``.

    Accepts raw module state_dicts and ``nn.DataParallel`` ones (the
    reference's ``save_checkpoint`` stores the latter, networks.py:30-38 —
    every key carries a ``module.`` prefix, stripped here). Every torch key
    must map onto an existing flax leaf of identical shape, and every flax
    leaf must be covered; anything else raises, so a silent half-port is
    impossible. Returns new variables (input is not mutated).
    """
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    want = {}
    for path, leaf in flat:
        keys = tuple(getattr(p, "key", getattr(p, "name", None)) for p in path)
        want[keys] = leaf

    out = {}
    for key, value in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        translated = _translate_key(key)
        if translated is None:
            continue
        coll, path, fn = translated
        full = (coll,) + path
        if full not in want:
            raise KeyError(f"{key!r} -> {full} not present in flax variables")
        arr = fn(_to_numpy(value))
        if arr.shape != want[full].shape:
            raise ValueError(
                f"{key!r} -> {full}: shape {arr.shape} != "
                f"expected {want[full].shape}")
        out[full] = jnp.asarray(arr, want[full].dtype)

    missing = sorted(set(want) - set(out))
    if missing:
        raise ValueError(f"torch state_dict left flax leaves unfilled: "
                         f"{missing[:8]}{'...' if len(missing) > 8 else ''}")

    # Reassemble the nested dict from the flat assignments.
    nested = {}
    for full, arr in out.items():
        cur = nested
        for k in full[:-1]:
            cur = cur.setdefault(k, {})
        cur[full[-1]] = arr
    return nested


def load_reference_checkpoint(path, variables):
    """Load a reference ``.pt`` checkpoint file (torch serialized dict with
    ``step`` / ``network`` / ``optimizer`` entries, networks.py:30-38) and
    port its network weights. Requires torch at call time only."""
    import torch

    # weights_only: the documented payload is plain tensors/ints/dicts —
    # never execute pickle code from a checkpoint file
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    state_dict = ckpt["network"] if "network" in ckpt else ckpt
    return port_reference_state_dict(state_dict, variables), ckpt.get("step")


# --------------------------------------------------------------------------
# Reverse direction: flax variables -> reference torch state_dict
# --------------------------------------------------------------------------

_DOUBLECONV_IDX = {unit: idx for idx, unit in _DOUBLECONV_UNITS.items()}


def _torch_prefix(path) -> str:
    """Inverse of :func:`_translate_key`'s grammar: a flax module path (the
    variable path minus collection and leaf name) -> the reference torch
    state_dict key prefix for that module (reference networks.py:313-461)."""
    top, rest = path[0], tuple(path[1:])
    if rest == ("conv",):                                   # OutConv
        return f"{top}.conv"
    if len(rest) == 2 and rest[0] == "conv" and rest[1] in _DOUBLECONV_IDX:
        return f"{top}.conv.conv.{_DOUBLECONV_IDX[rest[1]]}"  # InConv
    if len(rest) == 2 and rest[1] == "up":                  # Decoder upsample
        return f"{top}.up_seq.{rest[0]}.up"
    if (len(rest) == 3 and rest[1] == "conv"
            and rest[2] in _DOUBLECONV_IDX):
        if rest[0].startswith("down"):                      # Encoder stage
            return (f"{top}.down_seq.{rest[0]}.mpconv.1.conv."
                    f"{_DOUBLECONV_IDX[rest[2]]}")
        if rest[0].startswith("up"):                        # Decoder stage
            return (f"{top}.up_seq.{rest[0]}.conv.conv."
                    f"{_DOUBLECONV_IDX[rest[2]]}")
    raise KeyError(f"no reference state_dict grammar for flax module "
                   f"path {path!r}")


def export_reference_state_dict(variables, step: int = 0):
    """Inverse of :func:`port_reference_state_dict`: turn flax
    ``{'params', 'batch_stats'}`` variables into a reference-grammar torch
    state_dict (numpy float32 arrays, keys WITHOUT the DataParallel
    ``module.`` prefix — callers writing a reference ``.pt`` add it).

    Layout conversions are the exact inverses of the import direction
    (module docstring); ``num_batches_tracked`` — which flax does not keep —
    is synthesized as ``step`` for every BN module (torch only consults it
    under ``momentum=None``, which the reference never uses). Round-tripping
    through :func:`port_reference_state_dict` reproduces the input
    bit-exactly (tests/test_torch_parity.py)."""
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    out = {}
    bn_prefixes = set()
    for path, leaf in flat:
        keys = tuple(getattr(p, "key", getattr(p, "name", None)) for p in path)
        coll, mod_path, name = keys[0], keys[1:-1], keys[-1]
        prefix = _torch_prefix(mod_path)
        arr = np.asarray(jax.device_get(leaf), dtype=np.float32)
        if mod_path[-1].startswith("bn"):
            bn_prefixes.add(prefix)
            if coll == "batch_stats":
                torch_leaf = {"mean": "running_mean", "var": "running_var"}[name]
            else:
                torch_leaf = {"scale": "weight", "bias": "bias"}[name]
            out[f"{prefix}.{torch_leaf}"] = arr
        elif name == "kernel":
            if mod_path[-1] == "up":  # ConvTranspose2d: unflip, then permute
                arr = arr[::-1, ::-1].transpose(2, 3, 0, 1)
            else:                     # Conv2d
                arr = arr.transpose(3, 2, 0, 1)
            out[f"{prefix}.weight"] = np.ascontiguousarray(arr)
        else:
            out[f"{prefix}.bias"] = arr
    for prefix in bn_prefixes:
        out[f"{prefix}.num_batches_tracked"] = np.asarray(step, dtype=np.int64)
    return out


def save_reference_checkpoint(variables, step, path, lr: float,
                              weight_decay: float = 0.01) -> None:
    """Write a checkpoint file the reference's ``load_checkpoint``
    (networks.py:41-56) loads as-is: torch-serialized
    ``{'step', 'network': DataParallel state_dict, 'optimizer': ...}``.

    Keys carry the ``module.`` prefix (the reference wraps every factory
    model in ``nn.DataParallel``, networks.py:27). The optimizer entry is a
    FRESH AdamW state_dict with the correct group structure — moments are
    torch-layout and are not exported, so fine-tuning on the reference side
    restarts AdamW, mirroring the import direction's documented contract.
    Requires torch at call time only."""
    import torch

    state_dict = export_reference_state_dict(variables, step=int(step))
    # copy=True: device_get arrays can be read-only views, which torch
    # tensors reject (non-writable warning / undefined behavior on write)
    network = {f"module.{k}": torch.from_numpy(np.array(v, copy=True))
               for k, v in state_dict.items()}
    n_params = sum(1 for k in state_dict if k.endswith((".weight", ".bias")))
    # a throwaway AdamW over n_params dummy leaves yields a loadable fresh
    # state_dict: load_state_dict only checks group/param-count structure
    dummies = [torch.nn.Parameter(torch.zeros(1)) for _ in range(n_params)]
    opt = torch.optim.AdamW(dummies, lr=lr, weight_decay=weight_decay)
    torch.save({"step": int(step), "network": network,
                "optimizer": opt.state_dict()}, path)


# --------------------------------------------------------------------------
# FC-Siam-diff (SiamUnet_diff) — flat attribute grammar, own mapping
# --------------------------------------------------------------------------

def _siamunet_diff_key_map():
    """torch attribute prefix -> (flax module path, is_transposed_conv).

    The vendored FC-Siam-diff (reference networks.py:466-658) names layers
    flat — conv11/bn11 ... conv43d, upconv4 — unlike the DoubleConv grammar
    the generic translator handles. Encoder stage s has convs conv{s}{i};
    decoder stage s applies conv{s}{j}d in DESCENDING j order, which maps to
    this repo's dec{s}_{1..} application order (models/networks.py
    SiamUnetDiff); conv11d is the final logits head ('outc')."""
    mapping = {}
    widths = [2, 2, 3, 3]  # convs per encoder stage
    for s, n in enumerate(widths, start=1):
        for i in range(1, n + 1):
            mapping[f"conv{s}{i}"] = ((f"enc{s}_{i}", "conv"), False)
            mapping[f"bn{s}{i}"] = ((f"enc{s}_{i}", "bn"), None)
    for s in (4, 3, 2, 1):
        mapping[f"upconv{s}"] = ((f"upconv{s}",), True)
        dec_js = {4: (3, 2, 1), 3: (3, 2, 1), 2: (2, 1), 1: (2,)}[s]
        for idx, j in enumerate(dec_js, start=1):
            mapping[f"conv{s}{j}d"] = ((f"dec{s}_{idx}", "conv"), True)
            mapping[f"bn{s}{j}d"] = ((f"dec{s}_{idx}", "bn"), None)
    mapping["conv11d"] = (("outc",), True)
    return mapping


def port_siamunet_diff_state_dict(state_dict, variables):
    """Port a reference ``SiamUnet_diff`` state_dict into the flax
    :class:`..models.networks.SiamUnetDiff` variables."""
    mapping = _siamunet_diff_key_map()

    def plain(d):
        if hasattr(d, "items"):
            return {k: plain(v) for k, v in d.items()}
        return d

    out = plain(variables)  # mutable plain-dict copy (may be a FrozenDict)
    filled: set = set()

    def assign(coll_path, arr):
        cur = out
        for k in coll_path[:-1]:
            cur = cur[k]
        want = cur[coll_path[-1]]
        if arr.shape != want.shape:
            raise ValueError(f"{coll_path}: shape {arr.shape} != {want.shape}")
        cur[coll_path[-1]] = jnp.asarray(arr, want.dtype)
        filled.add(coll_path)

    for key, value in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        attr, leaf = key.rsplit(".", 1)
        if leaf == "num_batches_tracked":
            continue
        if attr not in mapping:
            raise ValueError(
                f"unmapped torch key {key!r}: not a reference SiamUnet_diff "
                f"state_dict (known modules: {len(mapping)})")
        path, transposed = mapping[attr]
        arr = _to_numpy(value)
        if transposed is None:  # BatchNorm
            coll, name = _BN_LEAVES[leaf]
            assign((coll,) + path + (name,), arr)
        else:
            name = "kernel" if leaf == "weight" else "bias"
            if leaf == "weight":
                arr = _conv_transpose_kernel(arr) if transposed \
                    else _conv_kernel(arr)
            assign(("params",) + path + (name,), arr)

    # a silent half-port is impossible: every flax leaf must have been
    # assigned (same guarantee as port_reference_state_dict)
    def leaf_paths(d, prefix=()):
        for k, v in d.items():
            if hasattr(v, "items"):
                yield from leaf_paths(v, prefix + (k,))
            else:
                yield prefix + (k,)

    missing = sorted(set(leaf_paths(out)) - filled)
    if missing:
        raise ValueError(
            f"torch state_dict left flax leaves unfilled: {missing[:5]}"
            f"{' ...' if len(missing) > 5 else ''}")
    return out

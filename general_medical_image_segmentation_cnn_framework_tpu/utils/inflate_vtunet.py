"""VT-UNet 2-D -> 3-D weight inflation (pure numpy — no mmcv, no torch).

Re-implements the reference's ``SwinTransformerSys3D.inflate_weights``
(/root/reference/models/three_d/vt_unet.py:1004-1060) for the Flax
VT-UNet: warm-start the 3-D encoder from a published 2-D Swin checkpoint
(e.g. swin_tiny_patch4_window7_224.pth).

Algorithm (matching the reference exactly):
* ``patch_embed.proj.weight`` [E, C, kh, kw] gains a depth axis: repeated
  ``kd`` times and divided by ``kd`` (mean-preserving inflation);
* every ``relative_position_bias_table`` [L1, nH] is bicubic-resized in its
  2-D window plane to (2*wh-1, 2*ww-1) when sizes differ, then tiled
  (2*wd-1) times along the depth-major axis — the same layout our
  ``_relative_position_index`` produces;
* ``relative_position_index`` / ``attn_mask`` buffers are dropped (always
  re-derived);
* everything else loads name-for-name where shapes agree (strict=False
  semantics); decoder / head params keep their fresh initialization.

Channel-count mismatches in the stem (2-D Swin is RGB) are handled by
averaging the pretrained input channels and broadcasting to ``in_chans``.

Usage::

    import torch
    sd = torch.load("swin_tiny_patch4_window7_224.pth", map_location="cpu")
    sd = sd.get("model", sd)
    sd = {k: v.numpy() for k, v in sd.items()}
    params = inflate_swin2d_into_vtunet(sd, variables["params"],
                                        window_size=(7, 7, 7),
                                        patch_size=(4, 4, 4))
"""

from __future__ import annotations

import copy
from typing import Dict, Sequence, Tuple

import numpy as np


def _cubic_interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense [out_size, in_size] 1-D bicubic interpolation matrix with
    torch.nn.functional.interpolate(mode='bicubic') semantics: cubic
    convolution kernel A=-0.75, half-pixel source mapping
    (align_corners=False), border taps clamped, antialias=False."""
    A = -0.75

    def k1(x):  # |x| <= 1 branch of the cubic convolution kernel
        return ((A + 2.0) * x - (A + 3.0)) * x * x + 1.0

    def k2(x):  # 1 < |x| < 2 branch
        return ((A * x - 5.0 * A) * x + 8.0 * A) * x - 4.0 * A

    m = np.zeros((out_size, in_size), dtype=np.float64)
    scale = in_size / out_size
    for o in range(out_size):
        x = (o + 0.5) * scale - 0.5
        x0 = int(np.floor(x))
        t = x - x0
        coeffs = (k2(t + 1.0), k1(t), k1(1.0 - t), k2(2.0 - t))
        for tap, c in zip(range(x0 - 1, x0 + 3), coeffs):
            m[o, min(max(tap, 0), in_size - 1)] += c
    return m


def _bicubic_resize_table(table: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """Bicubic-resize a [L1, nH] table whose rows form an S1 x S1 grid to
    out_hw, returning [out_h*out_w, nH]. Pure numpy, bit-matching the
    reference's torch.nn.functional.interpolate(mode='bicubic') call
    (reference vt_unet.py:1034-1052) — tested against torch in
    tests/test_inflate_vtunet.py."""
    l1, nh = table.shape
    s1 = int(round(l1 ** 0.5))
    if (s1 * s1) != l1:
        raise ValueError(f"bias table length {l1} is not a square grid")
    if (s1, s1) == tuple(out_hw):
        return table
    grid = table.astype(np.float64).T.reshape(nh, s1, s1)
    mh = _cubic_interp_matrix(s1, out_hw[0])
    mw = _cubic_interp_matrix(s1, out_hw[1])
    out = np.einsum("oi,nij,pj->nop", mh, grid, mw)
    return out.reshape(nh, out_hw[0] * out_hw[1]).T.astype(np.float32)


def _get_shape(tree: Dict, path: Sequence[str]):
    node = tree
    for part in path:
        if part not in node:
            return None
        node = node[part]
    return tuple(np.asarray(node).shape)


def _effective_window(target_len: int, window_size) -> Tuple[int, int, int]:
    """Blocks whose input extent is smaller than the window use a clamped
    window (get_window_size), giving a smaller bias table. Recover the
    effective (wd', wh', ww') from the table length: the largest
    per-dim-clamped window with prod(2w-1) == target_len."""
    wd, wh, ww = window_size
    best = None
    for d in range(wd, 0, -1):
        for h in range(wh, 0, -1):
            for w in range(ww, 0, -1):
                if (2 * d - 1) * (2 * h - 1) * (2 * w - 1) == target_len:
                    cand = (d, h, w)
                    if best is None or cand > best:
                        best = cand
    return best or window_size


def _set(tree: Dict, path: Sequence[str], value: np.ndarray, report: list) -> None:
    node = tree
    for part in path[:-1]:
        if part not in node:
            report.append(f"skip (no scope): {'/'.join(path)}")
            return
        node = node[part]
    leaf = path[-1]
    if leaf not in node:
        report.append(f"skip (no param): {'/'.join(path)}")
        return
    want = np.asarray(node[leaf]).shape
    if tuple(value.shape) != tuple(want):
        report.append(f"skip (shape {value.shape} != {want}): {'/'.join(path)}")
        return
    node[leaf] = value.astype(np.asarray(node[leaf]).dtype)
    report.append(f"loaded: {'/'.join(path)}")


def inflate_swin2d_into_vtunet(
    state_dict: Dict[str, np.ndarray],
    params: Dict,
    window_size: Tuple[int, int, int] = (7, 7, 7),
    patch_size: Tuple[int, int, int] = (4, 4, 4),
) -> Tuple[Dict, list]:
    """Inflate a 2-D Swin ``state_dict`` (numpy arrays, torch naming) into a
    copy of the Flax SwinTransformerSys3D ``params`` tree.

    Accepts either the SwinTransformerSys3D subtree or a VTUNet tree
    containing ``SwinTransformerSys3D_0``. Returns (new_params, report).
    """
    params = copy.deepcopy(
        {k: v for k, v in params.items()}
        if not hasattr(params, "unfreeze")
        else params.unfreeze()
    )
    root = params
    prefix: Tuple[str, ...] = ()
    if "SwinTransformerSys3D_0" in root:
        prefix = ("SwinTransformerSys3D_0",)
        root = root["SwinTransformerSys3D_0"]

    report: list = []
    wd, wh, ww = window_size
    kd = patch_size[0]

    sd = {
        k: np.asarray(v)
        for k, v in state_dict.items()
        if "relative_position_index" not in k and "attn_mask" not in k
    }

    # --- patch embed -------------------------------------------------------
    if "patch_embed.proj.weight" in sd:
        w = sd["patch_embed.proj.weight"]  # [E, C, kh, kw]
        w3 = np.repeat(w[:, :, None], kd, axis=2) / float(kd)  # [E, C, kd, kh, kw]
        kernel = np.transpose(w3, (2, 3, 4, 1, 0))  # [kd, kh, kw, C, E]
        want_cin = np.asarray(root["Conv_0"]["kernel"]).shape[3]
        if kernel.shape[3] != want_cin:
            kernel = np.broadcast_to(
                kernel.mean(axis=3, keepdims=True),
                kernel.shape[:3] + (want_cin,) + kernel.shape[4:],
            ).copy()
            report.append(
                f"patch_embed: averaged {w3.shape[1]} pretrained input "
                f"channels into {want_cin}"
            )
        _set(params, prefix + ("Conv_0", "kernel"), kernel, report)
    if "patch_embed.proj.bias" in sd:
        _set(params, prefix + ("Conv_0", "bias"), sd["patch_embed.proj.bias"], report)
    if "patch_embed.norm.weight" in sd:
        _set(params, prefix + ("LayerNorm_0", "scale"), sd["patch_embed.norm.weight"], report)
        _set(params, prefix + ("LayerNorm_0", "bias"), sd["patch_embed.norm.bias"], report)

    # --- encoder stages ----------------------------------------------------
    for key, value in sorted(sd.items()):
        if not key.startswith("layers."):
            continue
        parts = key.split(".")
        stage = int(parts[1])
        layer_scope = f"BasicLayer_{stage}"
        if parts[2] == "blocks":
            block = int(parts[3])
            bscope = prefix + (layer_scope, f"SwinTransformerBlock3D_{block}")
            rest = parts[4:]
            if rest[0] == "norm1":
                _set(params, bscope + ("LayerNorm_0", "scale" if rest[1] == "weight" else "bias"), value, report)
            elif rest[0] == "norm2":
                _set(params, bscope + ("LayerNorm_1", "scale" if rest[1] == "weight" else "bias"), value, report)
            elif rest[:2] == ["attn", "qkv"]:
                if rest[2] == "weight":
                    _set(params, bscope + ("WindowAttention3D_0", "Dense_0", "kernel"), value.T, report)
                else:
                    _set(params, bscope + ("WindowAttention3D_0", "Dense_0", "bias"), value, report)
            elif rest[:2] == ["attn", "proj"]:
                if rest[2] == "weight":
                    _set(params, bscope + ("WindowAttention3D_0", "Dense_1", "kernel"), value.T, report)
                else:
                    _set(params, bscope + ("WindowAttention3D_0", "Dense_1", "bias"), value, report)
            elif rest[0] == "attn" and rest[1] == "relative_position_bias_table":
                tpath = bscope + ("WindowAttention3D_0", "relative_position_bias_table")
                tshape = _get_shape(params, tpath)
                ewd, ewh, eww = (
                    _effective_window(tshape[0], (wd, wh, ww))
                    if tshape is not None
                    else (wd, wh, ww)
                )
                resized = _bicubic_resize_table(value, (2 * ewh - 1, 2 * eww - 1))
                inflated = np.tile(resized, (2 * ewd - 1, 1))  # depth-major blocks
                _set(params, tpath, inflated, report)
            elif rest[:2] == ["mlp", "fc1"]:
                if rest[2] == "weight":
                    _set(params, bscope + ("Mlp_0", "Dense_0", "kernel"), value.T, report)
                else:
                    _set(params, bscope + ("Mlp_0", "Dense_0", "bias"), value, report)
            elif rest[:2] == ["mlp", "fc2"]:
                if rest[2] == "weight":
                    _set(params, bscope + ("Mlp_0", "Dense_1", "kernel"), value.T, report)
                else:
                    _set(params, bscope + ("Mlp_0", "Dense_1", "bias"), value, report)
            else:
                report.append(f"skip (unmapped): {key}")
        elif parts[2] == "downsample":
            pscope = prefix + (layer_scope, "PatchMerging_0")
            if parts[3] == "reduction":
                _set(params, pscope + ("Dense_0", "kernel"), value.T, report)
            elif parts[3] == "norm":
                _set(params, pscope + ("LayerNorm_0", "scale" if parts[4] == "weight" else "bias"), value, report)
        else:
            report.append(f"skip (unmapped): {key}")

    return params, report

"""Stripe (spatial) parallelism: one image's decode sharded across devices.

Gigapixel-scan scale-out (SURVEY.md §5 "long-context analogue"): the
coefficient planes of ONE image are sharded by MCU block-rows over the mesh
"stripe" axis; each device runs dequant+IDCT+upsample+color on its stripe
via jax.shard_map. Cross-stripe communication:

  * nearest-neighbor upsampling (the reference's rule,
    /root/reference/src/colour_conversion.c:62-69) — ZERO halo rows: stripes
    are MCU-row aligned, so every output row's chroma source row lives in
    the same stripe;
  * "fancy" (triangular) upsampling — ONE chroma halo row per side,
    exchanged over the stripe axis with lax.ppermute (ICI neighbor traffic
    on real hardware).

Grayscale stripe mode uses the CORRECT addressing path (the REFERENCE
width-stride shear quirk, colour_conversion.c:20, is a global flat gather
and inherently non-local; whole-image mode replicates it).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.numerics import _nn_index_f32
from ..io.parser import parse
from ..models import decoder as decoder_mod
from ..ops import color as color_ops
from ..ops import idct as idct_ops
from ..utils.config import DecodeConfig, IdctPrecision
from ..utils.errors import JpegFormatError
from . import mesh as mesh_mod

F32 = jnp.float32


def _halo_exchange_rows(x, axis_name: str):
    """Exchange one boundary row with stripe neighbors; returns x extended
    by a top and bottom halo row (edge-replicated at the outer borders)."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    down = [(i, (i + 1) % n) for i in range(n)]  # my last row -> next shard's top halo
    up = [(i, (i - 1) % n) for i in range(n)]    # my first row -> prev shard's bottom halo
    top_halo = lax.ppermute(x[-1:], axis_name, down)
    bot_halo = lax.ppermute(x[:1], axis_name, up)
    top_halo = jnp.where(idx == 0, x[:1], top_halo)          # replicate edge
    bot_halo = jnp.where(idx == n - 1, x[-1:], bot_halo)
    return jnp.concatenate([top_halo, x, bot_halo], axis=0)


def _fancy_upsample_v2x_striped(xf, axis_name: str):
    """Vertical 2x triangular upsample with halo exchange (f32 in/out —
    floats flow between passes exactly like ops/color.fancy_upsample, which
    floors once at the end)."""
    ext = _halo_exchange_rows(xf, axis_name)  # [rows+2, w]
    up, mid, down = ext[:-2], ext[1:-1], ext[2:]
    even = (3.0 * mid + up + 1.0) * 0.25
    odd = (3.0 * mid + down + 2.0) * 0.25
    return jnp.stack([even, odd], axis=1).reshape(-1, xf.shape[1])


@functools.lru_cache(maxsize=64)
def make_shard_fn(key, n_stripes: int):
    """Build the per-stripe device function (the body shard_map maps).

    key is decoder._stage_key's tuple. The returned fn takes per-component
    coefficient STRIPES [by_i/n, bx_i, 64] and returns that stripe's RGB
    rows [padH/n, W, 3]; it must run under a shard_map binding
    mesh_mod.STRIPE_AXIS (axis_index/ppermute are used inside). Reused by
    decode_striped here and by the combined DP x SP step in
    __graft_entry__.py.
    """
    frame, qt_by_comp, precision, quirks, upsample = key
    comps = frame.components
    bits12 = frame.precision == 12
    exact = precision == IdctPrecision.EXACT
    qtables = [np.frombuffer(q, dtype=np.uint16).copy() for q in qt_by_comp]
    h, w = frame.height, frame.width
    vmax, hmax = frame.max_vsf, frame.max_hsf
    pad_h = frame.mcus_y * 8 * vmax
    if frame.mcus_y % n_stripes:
        raise JpegFormatError(
            f"stripe mode needs mcus_y ({frame.mcus_y}) divisible by"
            f" {n_stripes} stripes"
        )
    hs = pad_h // n_stripes  # output rows per stripe

    # Global NN index arrays (the reference's f32-ratio rule), extended over
    # the padded height so every stripe slices the same table.
    rows_idx = [
        np.asarray(
            _nn_index_f32(pad_h, np.float32(c.vsf) / np.float32(vmax)),
            dtype=np.int32,
        )
        for c in comps
    ]
    cols_idx = [
        np.asarray(
            _nn_index_f32(w, np.float32(c.hsf) / np.float32(hmax)),
            dtype=np.int32,
        )
        for c in comps
    ]

    def shard_fn(*coeff_stripes):
        sidx = lax.axis_index(mesh_mod.STRIPE_AXIS)
        chans = []
        for ci, c in enumerate(comps):
            blocks = coeff_stripes[ci].reshape(-1, 64)
            pix = idct_ops.idct_blocks(blocks, qtables[ci], precision, bits12)
            lby = c.blocks_y // n_stripes
            plane = idct_ops.blocks_to_plane(pix, lby, c.blocks_x)
            local_rows = lby * 8

            fancy_ok = (
                upsample == "fancy"
                and (c.hsf == hmax or 2 * c.hsf == hmax)
                and (c.vsf == vmax or 2 * c.vsf == vmax)
                and (2 * c.hsf == hmax or 2 * c.vsf == vmax)
            )
            if fancy_ok:
                up = plane.astype(F32)
                if 2 * c.hsf == hmax:
                    up = color_ops.fancy_h2x(up)
                if 2 * c.vsf == vmax:
                    up = _fancy_upsample_v2x_striped(up, mesh_mod.STRIPE_AXIS)
                # One floor at the end; both dims now at full resolution
                # (guaranteed by fancy_ok): crop the stripe-local plane.
                chans.append(jnp.floor(up).astype(jnp.uint8)[:hs, :w])
            else:
                # NN gather: global row table sliced to this stripe, made
                # stripe-local (MCU alignment keeps sources in-stripe).
                rows = lax.dynamic_slice(
                    jnp.asarray(rows_idx[ci]), (sidx * hs,), (hs,)
                ) - sidx * local_rows
                rows = jnp.clip(rows, 0, local_rows - 1)
                cols = jnp.asarray(cols_idx[ci])
                chans.append(plane[rows[:, None], cols[None, :]])

        if frame.ncs == 1:
            return color_ops.gray_to_rgb(chans[0])
        if frame.ncs == 3:
            return color_ops.ycbcr_to_rgb(*chans, exact=exact, quirks=quirks)
        return color_ops.ycck_to_rgb(*chans, exact=exact, quirks=quirks)

    return shard_fn


@functools.lru_cache(maxsize=64)
def build_striped_stage(key, mesh: Mesh, n_stripes: int):
    """jit(shard_map) program: coefficient planes (sharded on block rows
    over "stripe") -> [padH, W, 3] uint8 RGB (sharded on rows; crop to
    frame.height outside)."""
    frame = key[0]
    shard_fn = make_shard_fn(key, n_stripes)
    spec = P(mesh_mod.STRIPE_AXIS)
    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(spec,) * frame.ncs,
        out_specs=spec,
    )
    return jax.jit(mapped)


def decode_striped(
    data: bytes,
    cfg: DecodeConfig | None = None,
    mesh: Mesh | None = None,
):
    """Decode one (large) image with its device stage striped over the mesh.

    Host entropy decode is unchanged (segment-parallel native); only the
    device compute is spatially sharded.
    """
    cfg = cfg or DecodeConfig()
    if mesh is None:
        mesh = mesh_mod.make_mesh(n_data=1, n_stripe=len(jax.devices()))
    n_stripes = mesh.shape[mesh_mod.STRIPE_AXIS]
    structure = parse(data, cfg)
    planes, qts = decoder_mod._entropy_decode(structure, cfg)
    frame = structure.frame
    key = decoder_mod._stage_key(
        frame, decoder_mod.qt_by_comp_bytes(frame, qts), cfg
    )
    stage = build_striped_stage(key, mesh, n_stripes)
    sh = NamedSharding(mesh, P(mesh_mod.STRIPE_AXIS))
    dev_planes = [
        jax.device_put(planes.plane(ci), sh) for ci in range(frame.ncs)
    ]
    rgb = np.asarray(jax.device_get(stage(*dev_planes)))
    return rgb[: frame.height]

"""Texture tables + branchless sampling.

TPU re-design of the reference texture class hierarchy
(/root/reference/src/texture/texture.ts:26-35, texture_solid.ts:21-44,
texture_image.ts:20-137): virtual ``get_color(u, v)`` dispatch becomes two
static tables —

* ``solid_rgb [X, 3]`` — every texture's flat color (the SolidTexture color,
  or an image texture's *fallback* color, texture_image.ts:40-44);
* ``atlas [I, H, W, 3]`` — all image textures resized to one static
  resolution (images of equal shape are a hard requirement for fixed-shape
  gathers; the reference decodes arbitrary sizes through a DOM canvas,
  texture_image.ts:76-136 — a browser I/O path replaced here by
  PIL/NumPy in :mod:`raytracer_js_tpu.utils.image`).

Sampling is a gather + ``jnp.where`` select on ``kind`` — no per-texture
control flow, so a whole wavefront samples in one fused op. Nearest-neighbor
filtering matches texture_image.ts:40-63 (bilinear is an explicit TODO there).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..config import TextureKind

Array = jnp.ndarray


@struct.dataclass
class TextureTable:
    kind: Array        # [X] i32: TextureKind
    ref: Array         # [X] i32: row into atlas for IMAGE kind (0 for solid)
    solid_rgb: Array   # [X, 3] f32: solid color / image fallback
    atlas: Array       # [I, H, W, 3] f32 (I >= 1; row 0 is a dummy when unused)
    #: static: any IMAGE-kind entries? When False the atlas gather is
    #: compiled out entirely (solid colors ride a one-hot MXU matmul).
    has_images: bool = struct.field(pytree_node=False, default=True)
    #: static: any IMAGE_BILINEAR entries? Gates the 4-tap filtered path
    #: (the extra gathers are compiled out for nearest-only scenes).
    has_bilinear: bool = struct.field(pytree_node=False, default=False)

    @property
    def n_images(self) -> int:
        return self.atlas.shape[0]


def is_image_kind(kind: Array) -> Array:
    """Bool mask: does this TextureKind sample the atlas (nearest OR
    bilinear)? The single predicate every image-vs-solid dispatch site
    uses (trace glue, tiled glue, candidate packing)."""
    return ((kind == int(TextureKind.IMAGE))
            | (kind == int(TextureKind.IMAGE_BILINEAR)))


def sample(tex: TextureTable, tex_id: Array, u: Array, v: Array) -> Array:
    """Color of texture ``tex_id`` at (u, v); all args [N]-batched -> [N, 3].

    u, v are in [0, 1) (the trace path guarantees this via the equirect
    epsilon clamp, uv_mapping.ts:19-25; we additionally clamp, where the
    reference throws, texture_image.ts:49-50 — a wavefront cannot throw
    per-lane).

    Texel lookup: ``(ix, iy) = (floor(u*W), floor(v*H))``, row iy from the
    *bottom* of the image — the reference loader vertically flips into
    bottom-up storage at decode time (texture_image.ts:112-127); we keep
    images top-down in memory and flip at sample time instead.
    """
    from ..ops.gather import gather_cols

    tex_id = jnp.clip(tex_id, 0, tex.kind.shape[0] - 1)
    if not tex.has_images:
        (solid,) = gather_cols(tex_id, tex.solid_rgb)
        return solid
    solid, kind, img_row = gather_cols(tex_id, tex.solid_rgb, tex.kind,
                                       tex.ref)
    h, w = tex.atlas.shape[1], tex.atlas.shape[2]
    ix = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    iy = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    img = tex.atlas[img_row, (h - 1) - iy, ix]
    if tex.has_bilinear:
        # texel-center bilinear (the reference's texture_image.ts:52 TODO):
        # x = u*W - 0.5 puts integer x on texel centers; the 4 neighbor
        # taps are edge-clamped, weights are the fractional offsets. Same
        # bottom-up row flip as the nearest path.
        x = u * w - 0.5
        y = v * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]
        x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
        x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
        y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
        r0 = (h - 1) - y0i
        r1 = (h - 1) - y1i
        c00 = tex.atlas[img_row, r0, x0i]
        c10 = tex.atlas[img_row, r0, x1i]
        c01 = tex.atlas[img_row, r1, x0i]
        c11 = tex.atlas[img_row, r1, x1i]
        blin = ((1 - fx) * (1 - fy) * c00 + fx * (1 - fy) * c10
                + (1 - fx) * fy * c01 + fx * fy * c11)
        img = jnp.where(
            (kind == int(TextureKind.IMAGE_BILINEAR))[..., None], blin, img)
    return jnp.where(is_image_kind(kind)[..., None], img, solid)

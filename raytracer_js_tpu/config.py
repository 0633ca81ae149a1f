"""Typed configuration records for the TPU raytracer.

Mirrors the reference's plain config records (``RaytracerConfig``
/root/reference/src/raytracer.ts:33-43, ``CameraConfig``
/root/reference/src/view/camera.ts:27-45, walker/octree flags
/root/reference/src/octree_space.ts:154-156,
/root/reference/src/octree_entity.ts:81-90) as frozen dataclasses whose values
are *static* under ``jax.jit`` — they select code paths and shapes, never
traced values. Differentiable quantities (camera pose, material colors, entity
geometry) live in :mod:`raytracer_js_tpu.models.scene` pytrees instead.
"""
from __future__ import annotations

import dataclasses
import enum


class ResponseType(enum.IntEnum):
    """Material response taxonomy (reference /root/reference/src/material.ts:22-26).

    ``BOTH`` is declared but unhandled by the reference trace loop
    (raytracer.ts:250-251 default-returns); we reproduce that terminal
    behavior (ray keeps its current color) rather than the stub.
    """

    REFLECTION = 0
    TRANSMISSION = 1
    BOTH = 2


class RayStatus(enum.IntEnum):
    """Terminal state of a wavefront ray.

    The reference encodes these implicitly as control flow in ``Ray.trace()``
    (raytracer.ts:166-277); the wavefront formulation makes them an explicit
    per-ray i32 so every bounce is a fixed-shape masked update.

    * ``ALIVE``   — still bouncing.
    * ``LIGHT``   — hit an emissive material; inverse-square attenuation was
      applied (raytracer.ts:215-218, 273-275).
    * ``KEEP``    — terminated keeping its current color: non-mirror
      REFLECTION (raytracer.ts:222-225) or the unhandled BOTH response
      (raytracer.ts:250-251).
    * ``MISS``    — left the scene; color was modulated by the sky
      (raytracer.ts:267-271).
    * ``EXHAUST`` — bounce budget exceeded; color forced to black
      (raytracer.ts:256-263).
    """

    ALIVE = 0
    LIGHT = 1
    KEEP = 2
    MISS = 3
    EXHAUST = 4


class TextureKind(enum.IntEnum):
    SOLID = 0   # reference texture_solid.ts:21-44
    IMAGE = 1   # reference texture_image.ts:20-137 (nearest-neighbor)
    #: bilinear-filtered image — the reference's own TODO
    #: (texture_image.ts:52 "TODO: bilinear filtering"); capability beyond
    #: the reference, opt-in per texture (SceneBuilder.add_image_texture
    #: ``bilinear=True``)
    IMAGE_BILINEAR = 2


class ToneMapperKind(enum.IntEnum):
    """Tone mapping strategies (reference /root/reference/src/view/tone_mapping.ts:21-79)."""

    IDENTITY = 0
    STDDEV_AROUND_MEAN = 1
    ABSDEV_AROUND_MEAN = 2
    #: fixed [min_dynamic * 2^k, min_dynamic]-style window without stats
    #: (reference DynamicRangeLimitedToneMapper, tone_mapping.ts:35-46)
    DR_LIMITED = 3


class HitBackend(enum.Enum):
    """Nearest-hit search backend.

    * ``BRUTE``  — dense [rays, prims] intersection + argmin; maps to MXU
      matmuls + VPU selects; best for small/medium scenes.
    * ``OCTREE`` — per-level Morton-grid DDA over the CSR octree (the
      TPU-native re-expression of the reference's pointer walker,
      octree_space.ts:159-408).
    * ``PALLAS`` — blocked Pallas kernel (running-min over primitive tiles).
    * ``FUSED`` — whole-trace Pallas kernel (state resident in VMEM across
      bounces); restricted scene class (solid textures/sky, no
      transmission/roughness — kernels/trace_fused.supports), forward-only
      (no VJP); falls back to BRUTE when unsupported.
    * ``TILED`` — per-tile candidate-list Pallas kernel with divergent-
      bounce packet re-binning (render_tiled) — the big-scene (100k+ prim)
      frame path; same restricted class as FUSED, forward-only; falls back
      to BRUTE when unsupported.
    """

    BRUTE = "brute"
    OCTREE = "octree"
    PALLAS = "pallas"
    FUSED = "fused"
    TILED = "tiled"


# Epsilon the reference advances a respawned ray by to escape the previous
# collision point (raytracer.ts:158-164).
EPS_ADVANCE = 1e-3
# JS Number.EPSILON, used in the inverse-square-law denominator
# (raytracer.ts:274) and the equirect UV clamp (uv_mapping.ts:19-25).
JS_EPSILON = 2.0 ** -52


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render parameters (reference RaytracerConfig, raytracer.ts:33-43).

    ``refmax``/``distance_attenuation_factor`` match the reference semantics;
    everything else is new TPU-side capability (sampling, backend choice).
    """

    refmax: int = 4
    distance_attenuation_factor: float = 1.0
    #: samples per pixel per call (Monte-Carlo scatter averaging inside one
    #: kernel launch; the reference instead averages frames over time,
    #: exposure_buffer.ts:53-91).
    spp: int = 1
    backend: HitBackend = HitBackend.BRUTE
    #: genuine ``ResponseType.BOTH`` (EXTENSION): stochastic Fresnel split
    #: — each BOTH hit continues as the reflected OR refracted ray with
    #: Schlick probability drawn from the (seed, ray id, bounce) counter
    #: RNG (single-sample unbiased; average over frames/spp like rough
    #: scatter). False reproduces the reference's terminal default
    #: (material.ts:25 declared, raytracer.ts:250-251 default-returns).
    fresnel_both: bool = False
    #: unroll the bounce fori_loop. Unrolling lets XLA fuse across bounces
    #: but multiplies trace size by refmax (first compiles over the remote
    #: TPU tunnel were observed at ~10 min unrolled vs seconds rolled).
    unroll: bool = False
    #: rematerialize each bounce in the VJP (jax.checkpoint, with flat
    #: loop carries) instead of saving its residuals. REQUIRED for
    #: big-wavefront gradients over big prim tables: without it 2.09M
    #: rays x 1002-row tables save 44.6 GB of residuals against 15.75 GB
    #: of HBM (measured r3). Off by default: the recompute + carry
    #: reshapes cost ~3.4x on the small-scene headline backward, which
    #: never OOMs. Gradients are identical either way
    #: (tests/test_grad.test_remat_gradients_match).
    remat: bool = False
    #: documented divergence from the reference: nearest forward hit
    #: (argmin t) instead of first-entity-in-set-order (raytracer.ts:186-195).
    #: Kept as a field only for documentation; nearest-hit is the behavior.
    nearest_hit: bool = True


@dataclasses.dataclass(frozen=True)
class OctreeConfig:
    """Octree build parameters.

    ``max_depth`` plays the role of the reference's ``max_in_depth``
    (octree_entity.ts:81-90); outward re-rooting (octree_entity.ts:125-171)
    does not exist here because the root AABB is chosen up front to cover the
    scene — re-rooting a static SoA tree is a rebuild with a larger root.
    """

    max_depth: int = 4
    #: maximum entities per node after CSR padding; nodes beyond this raise
    #: at build time (analogue of the reference's TreeOutsideGrowError being
    #: a typed, recoverable build failure, octree_entity.ts:116-123).
    max_entities_per_node: int = 64


#: Performance-tunable registry. Every ``RT_*`` environment knob in the
#: package, its FROZEN default (the measured-best value from the perf
#: ledger in CLAUDE.md — a fresh checkout with zero env vars set runs at
#: the benchmarked configuration), and whether it is experimental.
#: All knobs are read at IMPORT or TRACE time: changing one after a jit
#: cache is warm has no effect on already-compiled programs.
#:
#: ====================  =======  ============  =============================
#: env var               default  status        measured basis
#: ====================  =======  ============  =============================
#: RT_FUSE_SUB           32       frozen        r1 sweep: 32 -> 3.69 ms/frame
#: RT_NH_BLOCK_R         128      frozen        r5 exact-kernel re-sweep:
#:                                              kernel+select 826/730/672
#:                                              at 512/256/128
#: RT_NH_CHUNK_T         16       frozen        r5: 672/595/558/551 ms at
#:                                              4/8/16/32 (serial cond
#:                                              latency; 16 = 99% plateau)
#: RT_TILED_MIN_PRIMS    2048     frozen        r4 exp_c3 crossover
#: RT_TILE_SUB           32       frozen        r2 tiled kernel sweep
#: RT_WAVE_SUB           8        frozen        r2 packet-round sweep
#: RT_TILED_SEG          128      frozen        r3 segment-cond compaction
#: RT_TILE_CHUNK         16       frozen        r2 candidate seg alignment
#: RT_FRAME_SHORT_MIN    12       frozen        r2 frame-shortlist crossover
#: RT_SHORTLIST_MIN      4096     frozen        r1: shortlists lose at <=50
#: RT_NH_SUB_R           512      frozen        r5 exp_c4: sub-blocks lose
#:                                              (426/445/544/742 ms at
#:                                              512/128/64/32)
#: RT_SWEEP_LISTED       on       frozen        r4 listed cull + early exit
#: RT_LISTED_MAX_TILES   2048     frozen        r4 SMEM id-window cap
#: RT_TILED_ROUNDS       10       frozen        r2 retry-round convergence
#: RT_TILED_ESC_MAX      16384    frozen        r3 scoped-VMEM wave cap
#: RT_TILED_SWEEP_MAX    1048576  frozen        r4: sweep ~2x packet @1M
#: RT_TILED_SWEEP_SLICE  655360   frozen        r3 sweep-slice sizing
#: RT_TILED_RESCUE_CAP   65536    frozen        r3 straggler-count sizing
#: RT_SWEEP_CULL         off      experimental  r3: cull REGRESSED (1.15 s
#:                                              vs 0.93 s) — opt-in only
#: RT_GATHER_SPLIT       off      experimental  forward-only precision (see
#:                                              ops/gather.onehot_gather)
#: RT_REPLAY_CKPT        off      experimental  r4 exp_backward: default
#:                                              (no ckpt) measured best
#: RT_NO_SHORTLIST /     off      debug         disable-path switches for
#: RT_NO_FRAME_KERNEL /                         A/B measurements only
#: RT_NO_FRAME_SHORT
#: ====================  =======  ============  =============================


def tunables() -> dict:
    """Current values of every perf tunable (for bench JSON provenance)."""
    import os

    names = ["RT_FUSE_SUB", "RT_NH_BLOCK_R", "RT_NH_CHUNK_T",
             "RT_NH_SUB_R", "RT_TILED_MIN_PRIMS", "RT_TILE_SUB",
             "RT_WAVE_SUB", "RT_TILED_SEG", "RT_TILE_CHUNK",
             "RT_FRAME_SHORT_MIN", "RT_SHORTLIST_MIN", "RT_SWEEP_LISTED",
             "RT_LISTED_MAX_TILES", "RT_TILED_ROUNDS", "RT_TILED_ESC_MAX",
             "RT_TILED_SWEEP_MAX", "RT_TILED_SWEEP_SLICE",
             "RT_TILED_RESCUE_CAP", "RT_SWEEP_CULL", "RT_GATHER_SPLIT",
             "RT_REPLAY_CKPT", "RT_NO_SHORTLIST", "RT_NO_FRAME_KERNEL",
             "RT_NO_FRAME_SHORT"]
    return {k: os.environ[k] for k in names if k in os.environ}


@dataclasses.dataclass(frozen=True)
class ToneMapConfig:
    """Dynamic-range windowing (reference tone_mapping.ts:35-79)."""

    kind: ToneMapperKind = ToneMapperKind.IDENTITY
    #: log2 of the dynamic range span (reference ``dynamic_range`` with
    #: ``dynamic_coef = 1 << dynamic_range``, tone_mapping.ts:40).
    dynamic_range: int = 8
    min_dynamic: float = 1e-4
    max_dynamic: float = 1e4

"""Frame front end: one device program from a stereo pair to a Frame.

TPU-native replacement for Frame::Frame (ref: src/orbslam/Frame.cc:86-175),
which on the CPU runs segmentation (GPU round-trip), two extraction
threads, semantic filtering, stereo matching and grid assignment. Here
the full pipeline — Bayesian SegNet MC sampling, both pyramids, FAST,
orientation, rBRIEF, semantic gating, stereo association — is a single
jitted computation; nothing returns to the host until tracking needs
scalars.

The reference's left/right std::thread split (Frame.cc:126-129) becomes
a batched [2, L, H, W] pyramid; the semantic keypoint *compaction*
(SelectSemanticKeys, Frame.cc:177-203) becomes a mask (fixed shapes).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from sivo_tpu.config import SystemConfig
from sivo_tpu.models import segnet as segnet_mod
from sivo_tpu.ops import fast as fast_ops
from sivo_tpu.ops import image as image_ops
from sivo_tpu.ops import orb as orb_ops
from sivo_tpu.ops import stereo as stereo_ops
from sivo_tpu.select import semantic as semantic_ops


class Frame(NamedTuple):
    """Padded SoA frame (capacity N = cfg.orb.max_keypoints).

    Mirrors the reference Frame's per-keypoint arrays restricted to the
    semantic set (ref: Frame.h mvKeysSemantic/mDescriptorsSemantic/
    mvuRight/mvDepth/mClasses...), as masks over fixed arrays.
    """

    xy: jnp.ndarray  # (N, 2) level-0 pixel coords
    level: jnp.ndarray  # (N,) int32 octave
    angle: jnp.ndarray  # (N,) float32 radians
    desc_bits: jnp.ndarray  # (N, 256) float32
    desc_u8: jnp.ndarray  # (N, 32) uint8
    u_right: jnp.ndarray  # (N,) float32, -1 if no stereo match
    depth: jnp.ndarray  # (N,) float32, -1 if no stereo match
    sem_class: jnp.ndarray  # (N,) uint8 class at the keypoint pixel
    sem_confidence: jnp.ndarray  # (N,)
    sem_entropy: jnp.ndarray  # (N,) bits
    valid: jnp.ndarray  # (N,) extracted keypoint
    semantic: jnp.ndarray  # (N,) valid & static class (the reference's
    #                          mvKeysSemantic membership)
    classes_raster: jnp.ndarray  # (H, W) uint8
    confidence_raster: jnp.ndarray  # (H, W)
    entropy_raster: jnp.ndarray  # (H, W)

    @property
    def capacity(self) -> int:
        return self.xy.shape[0]


class FrontendStatics(NamedTuple):
    """Trace-time constants for the frontend program."""

    spec: image_ops.PyramidSpec
    budgets: tuple[int, ...]
    max_keypoints: int
    ini_th: float
    min_th: float
    fx: float
    bf: float
    mc_samples: int


def make_statics(cfg: SystemConfig) -> FrontendStatics:
    spec = image_ops.make_pyramid_spec(
        cfg.camera.height, cfg.camera.width,
        cfg.orb.n_levels, cfg.orb.scale_factor,
    )
    return FrontendStatics(
        spec=spec,
        budgets=image_ops.per_level_budgets(cfg.orb.n_features, spec),
        max_keypoints=cfg.orb.max_keypoints,
        ini_th=float(cfg.orb.ini_th_fast),
        min_th=float(cfg.orb.min_th_fast),
        fx=cfg.camera.fx,
        bf=cfg.camera.bf,
        mc_samples=cfg.semantic.mc_samples,
    )


def _extract_keypoints(
    gray: jnp.ndarray, statics: FrontendStatics
) -> tuple[orb_ops.Keypoints, jnp.ndarray]:
    """gray (H, W) -> (Keypoints, blurred canvas)."""
    raw, blur = image_ops.build_pyramid(gray, statics.spec)
    # detection region: [EDGE-3, size-(EDGE-3)) like the reference's
    # minBorderX = EDGE_THRESHOLD - 3 (ref: ORBextractor.cc:758-766)
    valid_region = image_ops.level_valid_mask(statics.spec, margin=16)
    kps = orb_ops.extract(
        raw, blur, valid_region, statics.spec, statics.budgets,
        statics.max_keypoints, statics.ini_th, statics.min_th,
    )
    return kps, blur


class PreFrame(NamedTuple):
    """Device-resident output of the frontend PRE program: everything
    the descriptor/stereo program needs, materialized as PROGRAM
    OUTPUTS so the Mosaic ORB kernel's canvas operands arrive as
    program INPUTS in the next dispatch (embedded-Mosaic HBM-operand
    penalty, ~27 ms per call otherwise — see ops/pallas_orb.prepare)."""

    raw_l: jnp.ndarray  # (L, Hc, Wc) float canvases
    blur_l: jnp.ndarray
    raw_r: jnp.ndarray
    blur_r: jnp.ndarray
    # pallas_orb.prepare outputs per image, or None (XLA path)
    prep_l: tuple | None
    prep_r: tuple | None
    sel_l: tuple  # (xy_level, level, score, valid)
    sel_r: tuple
    classes: jnp.ndarray
    confidence: jnp.ndarray
    entropy: jnp.ndarray


def frontend_pre(
    model: segnet_mod.SegNet,
    params: Any,
    statics: FrontendStatics,
    img_left_color: jnp.ndarray,
    img_right_gray: jnp.ndarray,
    rng: jnp.ndarray,
    sem_override=None,
    use_cnn_static: bool | None = None,
) -> PreFrame:
    """XLA half of the frame frontend: semantics (CNN), both pyramids,
    FAST, keypoint selection, canvas pad/convert + coord clamping.
    Traceable — callers may fold extra work (e.g. the bench's packed-u8
    unpack) into the same program."""
    img_left_color = img_left_color.astype(jnp.float32)
    if img_left_color.ndim == 2:
        img_left_color = jnp.repeat(
            img_left_color[:, :, None], 3, axis=-1
        )
    img_right_gray = img_right_gray.astype(jnp.float32)
    static_no_cnn = (
        sem_override is not None and use_cnn_static is False
    )
    # 1. Bayesian SegNet MC-dropout semantics (ref: Frame.cc:232-245)
    if not static_no_cnn:
        classes, confidence, entropy = segnet_mod.segment_image(
            model, params, img_left_color, rng, statics.mc_samples
        )
    if sem_override is not None:
        o_cls, o_conf, o_ent, use_cnn = sem_override
        if o_conf.dtype == jnp.uint8:
            o_conf = o_conf.astype(jnp.float32) * (1.0 / 255.0)
        if o_ent.dtype == jnp.uint8:
            o_ent = o_ent.astype(jnp.float32) * (1.0 / 32.0)
        if static_no_cnn:
            classes = o_cls
            confidence = o_conf.astype(jnp.float32)
            entropy = o_ent.astype(jnp.float32)
        elif use_cnn_static:  # static True: CNN only
            pass
        else:
            classes = jnp.where(use_cnn, classes, o_cls)
            confidence = jnp.where(
                use_cnn, confidence, o_conf.astype(jnp.float32)
            )
            entropy = jnp.where(
                use_cnn, entropy, o_ent.astype(jnp.float32)
            )

    # 2. pyramids + FAST + selection for both images
    #    (ref: Frame.cc:126-129, two CPU threads)
    gray_l = image_ops.bgr_to_gray(img_left_color)
    valid_region = image_ops.level_valid_mask(statics.spec, margin=16)
    from sivo_tpu.ops import pallas_orb

    use_k = orb_ops.use_pallas_orb(statics.max_keypoints)

    def one(gray):
        raw, blur = image_ops.build_pyramid(gray, statics.spec)
        sel = orb_ops.extract_select(
            raw, valid_region, statics.spec, statics.budgets,
            statics.max_keypoints, statics.ini_th, statics.min_th,
        )
        prep = (
            pallas_orb.prepare(raw, blur, sel[1], sel[0])
            if use_k else None
        )
        return raw, blur, sel, prep

    raw_l, blur_l, sel_l, prep_l = one(gray_l)
    raw_r, blur_r, sel_r, prep_r = one(img_right_gray)
    return PreFrame(
        raw_l=raw_l, blur_l=blur_l, raw_r=raw_r, blur_r=blur_r,
        prep_l=prep_l, prep_r=prep_r, sel_l=sel_l, sel_r=sel_r,
        classes=classes, confidence=confidence, entropy=entropy,
    )


def frontend_post(
    statics: FrontendStatics, pre: PreFrame
) -> Frame:
    """Second frame program: ORB description (Mosaic kernels — their
    canvas operands are this program's INPUTS), semantic gating, stereo
    matching, Frame assembly."""
    kps_l = orb_ops.extract_describe(
        pre.raw_l, pre.blur_l, statics.spec, *pre.sel_l, prep=pre.prep_l
    )
    kps_r = orb_ops.extract_describe(
        pre.raw_r, pre.blur_r, statics.spec, *pre.sel_r, prep=pre.prep_r
    )

    # semantic gating of left keypoints (ref: Frame.cc:177-203)
    sem_class, sem_conf, sem_ent = semantic_ops.sample_rasters(
        pre.classes, pre.confidence, pre.entropy, kps_l.xy
    )
    semantic = kps_l.valid & semantic_ops.static_class_mask(sem_class)

    # stereo matching on the semantic set vs all right keypoints
    # (ref: Frame.cc:144 — ComputeStereoMatches runs after
    # SelectSemanticKeys, on the filtered left set)
    left_sem = kps_l._replace(valid=semantic)
    matches = stereo_ops.match(
        left_sem, kps_r, pre.blur_l, pre.blur_r, statics.spec,
        statics.fx, statics.bf,
    )

    return Frame(
        xy=kps_l.xy,
        level=kps_l.level,
        angle=kps_l.angle,
        desc_bits=kps_l.desc_bits,
        desc_u8=kps_l.desc_u8,
        u_right=matches.u_right,
        depth=matches.depth,
        sem_class=sem_class,
        sem_confidence=sem_conf,
        sem_entropy=sem_ent,
        valid=kps_l.valid,
        semantic=semantic,
        classes_raster=pre.classes,
        confidence_raster=pre.confidence,
        entropy_raster=pre.entropy,
    )


build_frame_pre = functools.partial(
    jax.jit, static_argnames=("model", "statics", "use_cnn_static")
)(frontend_pre)
build_frame_post = functools.partial(
    jax.jit, static_argnames=("statics",)
)(frontend_post)


def build_frame(
    model: segnet_mod.SegNet,
    params: Any,
    statics: FrontendStatics,
    img_left_color: jnp.ndarray,  # (H, W, 3) float 0..255 (BGR order)
    img_right_gray: jnp.ndarray,  # (H, W) float
    rng: jnp.ndarray,
    sem_override: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]
    | None = None,
    use_cnn_static: bool | None = None,
) -> Frame:
    """The per-frame hot path (ref call stack: SURVEY §3.2), dispatched
    as TWO programs (pre: CNN/pyramids/FAST/select; post: Mosaic ORB
    kernels + stereo + assembly). The split is a hardware rule, not a
    style choice: a Mosaic kernel whose HBM operands are computed in
    the SAME program pays ~27 ms each on this backend (2 kernels =
    ~54 ms/frame, measured r5); operands crossing a program boundary
    are free, and the extra dispatch is ~2.6 ms of overlappable host
    time.

    ``sem_override``: optional (classes, confidence, entropy, use_cnn)
    — the provided rasters replace the CNN posterior when use_cnn is
    False (benchmarking with renderer semantics when no trained
    weights exist). Quantized rasters welcome: confidence uint8
    (x1/255), entropy uint8 (x1/32) — host->device bytes are the frame
    loop's bottleneck. ``use_cnn_static``: when the choice is fixed
    for the whole run, pass it HERE (static) — False drops the CNN
    from the compiled program entirely; None keeps the traced
    ``sem_override[3]`` runtime select.

    Accepts uint8 uploads (4x less host->device traffic); a (H, W)
    left image is broadcast to 3 channels on device (KITTI grayscale
    cameras — same CNN compute, a third of the upload bytes).
    """
    pre = build_frame_pre(
        model, params, statics, img_left_color, img_right_gray, rng,
        sem_override, use_cnn_static,
    )
    return build_frame_post(statics, pre)


@functools.partial(jax.jit, static_argnames=("statics",))
def build_frame_nosegnet(
    statics: FrontendStatics,
    gray_left: jnp.ndarray,
    gray_right: jnp.ndarray,
    classes: jnp.ndarray,
    confidence: jnp.ndarray,
    entropy: jnp.ndarray,
) -> Frame:
    """Frontend with externally-supplied semantic rasters (for tests and
    for pipelining segmentation separately from extraction)."""
    gray_left = gray_left.astype(jnp.float32)
    gray_right = gray_right.astype(jnp.float32)
    kps_l, blur_l = _extract_keypoints(gray_left, statics)
    kps_r, blur_r = _extract_keypoints(gray_right, statics)
    sem_class, sem_conf, sem_ent = semantic_ops.sample_rasters(
        classes, confidence, entropy, kps_l.xy
    )
    semantic = kps_l.valid & semantic_ops.static_class_mask(sem_class)
    left_sem = kps_l._replace(valid=semantic)
    matches = stereo_ops.match(
        left_sem, kps_r, blur_l, blur_r, statics.spec,
        statics.fx, statics.bf,
    )
    return Frame(
        xy=kps_l.xy,
        level=kps_l.level,
        angle=kps_l.angle,
        desc_bits=kps_l.desc_bits,
        desc_u8=kps_l.desc_u8,
        u_right=matches.u_right,
        depth=matches.depth,
        sem_class=sem_class,
        sem_confidence=sem_conf,
        sem_entropy=sem_ent,
        valid=kps_l.valid,
        semantic=semantic,
        classes_raster=classes,
        confidence_raster=confidence,
        entropy_raster=entropy,
    )

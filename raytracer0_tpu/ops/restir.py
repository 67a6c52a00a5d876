"""ReSTIR: spatiotemporal reservoir resampling for direct lighting.

Full redesign of the reference subsystem (raytracer.glsl:1264-1802 +
host buffer rotation index.js:795-820, SURVEY.md §2.4) as array ops over
the [H, W] pixel grid:

* reservoirs are an **unpacked SoA pytree** (`render.state.Reservoirs`) —
  the reference's lossy 0.33/0.33/0.34 alpha-packing (1423-1468) exists
  only because WebGL limits it to RGBA16/32F attachments; TPU arrays
  don't, so age/M/light_index are carried exactly;
* the three history buffers are functional state threaded through the
  frame loop (back → hist1 → hist2 rotation in `RenderState`);
* spatial reuse is 8 static Poisson-disk **gathers** on the previous
  frame's reservoir grid; under tile sharding these taps read halo rows
  exchanged via `ppermute` (`parallel.halo`);
* `light_index` stores the **slot** into `scene.light_idx` consistently.
  (The reference writes the mesh index in candidate generation (1652) but
  reads it back as an array slot (1762) — an index-space bug masked by
  its packing normalization; we use slot indices everywhere.)

Differentiable-state treatment per SURVEY.md §7.1-8: the discrete
selection (which light a reservoir holds) is detached; carried weights,
colors and the final shading are differentiable.

Execution tiers (fastest first, auto-dispatched by `render_pass`):
`render_sample_fused` — the whole pipeline inside one Pallas launch
(megakernel.trace_forward_restir_fused; requires identity temporal
reprojection, the default); `render_sample_fast` — G-buffer kernel +
XLA phases + cast_rays (serves `restir_adhoc_motion`); `render_sample`
— the XLA wavefront, the semantics oracle and a training path.  On TPU
the oracle's gradient-dead occlusion sweeps run on the Pallas
`cast_rays` kernel (`grad_safe_cast_fn` — gradient-exact, see its
docstring); the pure-XLA form is recoverable with RT0_NO_GRAD_CAST=1
in a fresh process.  The fused kernel is itself differentiable (round
5): its backward is the Pallas adjoint `megakernel._fused_restir_call`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracer0_tpu import rng
from raytracer0_tpu.models.materials import MatType, MeshType
from raytracer0_tpu.models.camera import generate_rays
from raytracer0_tpu.models import scene as scene_mod
from raytracer0_tpu.ops import intersect as isect
from raytracer0_tpu.ops import sampling as smp
from raytracer0_tpu.ops import vecmath as vm

ONE_OVER_PI = 0.31830989

# Constants (raytracer.glsl:1266-1273).
RESTIR_SPATIAL_SAMPLES = 8
_FORCE_GATHER_TAPS = False  # test hook: disable the static-roll tap path
SPATIAL_RADIUS = 16.0
TEMPORAL_ALPHA = 0.95
MAX_RESERVOIR_AGE = 30.0
MAX_TEMPORAL_SAMPLES = 2

# Poisson disk offsets (raytracer.glsl:1288-1297), unit disk.
POISSON_DISK = (
    (-0.4706, 0.4706), (0.8090, 0.2628), (-0.2628, -0.8090),
    (0.6882, -0.5000), (-0.9511, -0.1625), (0.1625, 0.9511),
    (0.5000, -0.6882), (-0.6882, 0.5000),
)


def empty_reservoir(batch):
    return dict(
        light_pos=jnp.zeros(batch + (3,), jnp.float32),
        light_color=jnp.zeros(batch + (3,), jnp.float32),
        weight_sum=jnp.zeros(batch, jnp.float32),
        m=jnp.zeros(batch, jnp.float32),
        w=jnp.zeros(batch, jnp.float32),
        age=jnp.zeros(batch, jnp.float32),
        light_index=jnp.full(batch, -1, jnp.int32),
    )


def _pack_res(tree):
    """Reservoir dict → one [..., 11] f32 array (pos, color, weight_sum,
    m, w, age, light_index).  Neighbor taps on TPU cost per *gather op*,
    not per byte — packing turns 7 gathers into 1 with a contiguous
    minor dim (measured 4x cheaper at 512²).  light_index values are
    tiny ints, exact through the f32 roundtrip."""
    return jnp.concatenate([
        tree["light_pos"], tree["light_color"],
        tree["weight_sum"][..., None], tree["m"][..., None],
        tree["w"][..., None], tree["age"][..., None],
        tree["light_index"].astype(jnp.float32)[..., None]], axis=-1)


def _unpack_res(p):
    return dict(
        light_pos=p[..., 0:3], light_color=p[..., 3:6],
        weight_sum=p[..., 6], m=p[..., 7], w=p[..., 8], age=p[..., 9],
        light_index=p[..., 10].astype(jnp.int32))


def _row_select(idx, table):
    """Per-lane row lookup into a tiny [n, C] f32 table as a one-hot
    contraction instead of an XLA gather.  A TPU gather costs ~2 ms per
    *op* at 512² regardless of table size (measured); the contraction is
    a fused compare + MXU matmul.  precision=highest keeps it bit-exact
    (1.0 × v accumulated in f32)."""
    n = table.shape[0]
    oh = (idx[..., None] == jnp.arange(n, dtype=idx.dtype)).astype(jnp.float32)
    return jnp.einsum("...n,nc->...c", oh, table,
                      precision=jax.lax.Precision.HIGHEST)


def _where_res(cond, a, b):
    out = {}
    for k in a:
        c = cond[..., None] if a[k].ndim > cond.ndim else cond
        out[k] = jnp.where(c, a[k], b[k])
    return out


def evaluate_target(light_pos, light_color, hit_pos, hit_normal,
                    mat_c, mat_nt, mat_type):
    """Target function p̂ (raytracer.glsl:1361-1387): luminance of emitted
    radiance x material-aware BRDF weight x cosθ / d²."""
    lv = light_pos - hit_pos
    d2 = vm.vdot(lv, lv)
    light_dir = vm.normalize(lv)
    cos_t = jnp.maximum(0.0, vm.vdot(hit_normal, light_dir))
    light_lum = vm.luminance(light_color)

    surface_lum = vm.luminance(mat_c)
    nnt = (mat_nt - 1.0) / jnp.maximum(mat_nt + 1.0, 1e-6)
    r0 = nnt * nnt
    is_refr = ((mat_type == MatType.REFR_FRESNEL) |
               (mat_type == MatType.REFR_SCHLICK)).astype(jnp.float32)
    is_coat = (mat_type == MatType.COAT).astype(jnp.float32)
    base = vm.mix(surface_lum, r0, is_refr)
    brdf_weight = vm.mix(base, (1.0 - r0) * surface_lum, is_coat) * ONE_OVER_PI

    p_hat = light_lum * brdf_weight * cos_t / jnp.maximum(d2, 1e-4)
    valid = (d2 >= 1e-6) & (cos_t > 0.0) & (light_lum > 0.0)
    return jnp.where(valid, p_hat, 0.0)


def update_reservoir(r, light_pos, light_color, light_slot, weight, rand):
    """Weighted reservoir update with M-overflow decay (raytracer.glsl:
    1305-1326).  All fields updated branch-free under `accept`."""
    take = weight > 0.0
    ws = r["weight_sum"] + jnp.where(take, weight, 0.0)
    m = r["m"] + jnp.where(take, 1.0, 0.0)
    overflow = m > 60.0
    ws = jnp.where(overflow, ws * 0.95, ws)
    m = jnp.where(overflow, m * 0.95, m)

    sel_prob = weight / jnp.maximum(ws, 1e-12)
    select = take & (ws > 0.0) & (rand < sel_prob)
    return dict(
        light_pos=vm.where3(select, light_pos, r["light_pos"]),
        light_color=vm.where3(select, light_color, r["light_color"]),
        light_index=jnp.where(select, light_slot, r["light_index"]),
        weight_sum=ws, m=m, w=r["w"], age=r["age"],
    )


def is_valid_reservoir(r, num_lights):
    """Validity gates (raytracer.glsl:1340-1359)."""
    def fin(x):
        return jnp.isfinite(x)

    ok = fin(r["m"]) & fin(r["weight_sum"]) & fin(r["w"]) & fin(r["age"])
    ok &= (r["m"] > 0.0) & (r["m"] <= 200.0)
    ok &= (r["weight_sum"] > 0.0) & (r["weight_sum"] <= 1000.0)
    ok &= (r["w"] >= 0.0) & (r["w"] <= 20.0)
    ok &= (r["age"] >= 0.0) & (r["age"] <= MAX_RESERVOIR_AGE + 5.0)
    lc2 = vm.vdot(r["light_color"], r["light_color"])
    ok &= (lc2 >= 1e-6) & (lc2 <= 1e4)
    ok &= (r["light_index"] < num_lights)
    lp2 = vm.vdot(r["light_pos"], r["light_pos"])
    ok &= ~((lp2 < 1e-6) & (r["light_index"] >= 0))
    return ok


def combine_reservoirs(target, source, hit_pos, hit_normal, mat_c, mat_nt,
                       mat_type, rand_val, num_lights, source_ok=None):
    """Merge `source` into `target` with target-function reweighting and
    M-cap 40 with proportional weight rescale (raytracer.glsl:1579-1611)."""
    ok = is_valid_reservoir(source, num_lights)
    if source_ok is not None:
        ok &= source_ok
    tw = evaluate_target(source["light_pos"], source["light_color"],
                         hit_pos, hit_normal, mat_c, mat_nt, mat_type)
    ok &= tw > 0.0

    contribution = jnp.clip(
        tw * jnp.maximum(source["w"], 0.0) * jnp.maximum(source["m"], 1.0),
        0.0, 200.0)

    ws = target["weight_sum"] + jnp.where(ok, contribution, 0.0)
    m = target["m"] + jnp.where(ok, source["m"], 0.0)

    over = m > 40.0
    scale = jnp.where(over, 40.0 / jnp.maximum(m, 1e-6), 1.0)
    ws = ws * scale
    m = jnp.minimum(m, 40.0)

    sel_prob = contribution / jnp.maximum(ws, 1e-12)
    select = ok & (ws > 0.0) & (rand_val < sel_prob)
    new_age = jnp.minimum(source["age"] + 0.25, MAX_RESERVOIR_AGE)
    return dict(
        light_pos=vm.where3(select, source["light_pos"], target["light_pos"]),
        light_color=vm.where3(select, source["light_color"], target["light_color"]),
        light_index=jnp.where(select, source["light_index"], target["light_index"]),
        age=jnp.where(select, new_age, target["age"]),
        weight_sum=ws, m=m, w=target["w"],
    )


def _default_cast(scene, cfg, sdf_march):
    """Nearest-hit query via the XLA intersector; the fast path swaps in
    `megakernel.cast_rays` (same (t, idx, missed) contract)."""
    def cast(o, d):
        hit = isect.intersect(scene, o, d, cfg, sdf_march=sdf_march,
                              need_normal=False, need_uv=False)
        return hit.t, hit.idx, hit.missed
    return cast


def grad_safe_cast_fn(scene_frame, cfg, height, width):
    """Pallas `cast_rays` for the DIFFERENTIABLE ReSTIR path, or None.

    The shadow/visibility casts' outputs are gradient-dead when
    volumetrics is off: `t` and `missed` feed only comparisons/booleans
    (`is_visible`; `_shade_selected`'s hit test) and `idx` is integer —
    every differentiable term (light tables, target weights, shading
    colors) is a table lookup *outside* the cast (raytracer.glsl:
    1389-1414 vs 1174-1230).  Wrapping the kernel's inputs in
    stop_gradient is therefore **exact**: reverse-mode AD never needs a
    VJP for the call, and the two per-diffuse-vertex occlusion sweeps
    run at kernel speed in both the fwd pass and the remat recompute of
    the bwd sweep.

    Measured effect (experiments/exp_grad_cast.py, v5e 512²,
    restir_demo): step time UNCHANGED (179→183 ms fwd+bwd, within
    noise — the differentiable pass is dominated by the reservoir-phase
    math and the path-trace AD, not the occlusion casts), gradients
    bit-identical (max rel err 0.0), compile time HALVED (77→34 s).
    Kept for the compile-time win and the smaller XLA graph.

    With volumetrics the Beer-Lambert factor exp(-sigma_t*t) carries a
    real geometry gradient through `t`, so the XLA cast stays (None).
    Also None off-TPU or when the kernel can't serve the scene — the
    caller falls back to `_default_cast` unchanged."""
    import os as _os

    from raytracer0_tpu.ops import megakernel

    # A/B hook, read at TRACE time: render_sample_jit and the Renderer
    # cache their jitted functions, so flipping the env var after the
    # first compile has no effect in-process — set it before the first
    # render (exp_grad_cast.py builds fresh jax.jit objects per run).
    if _os.environ.get("RT0_NO_GRAD_CAST") == "1":
        return None
    if cfg.use_volumetrics or not cfg.use_megakernel:
        return None
    if not megakernel.supported_restir(scene_frame, cfg):
        return None
    try:
        if jax.default_backend() != "tpu":
            return None
    except RuntimeError:
        return None
    sg = jax.lax.stop_gradient
    frozen = sg(scene_frame)

    # Pad unaligned shapes to the kernel block and crop: the cast then
    # serves ANY (height, width), so sharded bands and the monolithic
    # image always pick the same cast implementation (advisor r4 — the
    # two paths previously diverged when only one shape was
    # block-aligned).
    h2 = -(-height // megakernel.BLOCK_ROWS) * megakernel.BLOCK_ROWS
    w2 = -(-width // megakernel.BLOCK_COLS) * megakernel.BLOCK_COLS

    def cast(o, d):
        o, d = sg(o), sg(d)
        if (h2, w2) != (height, width):
            pw = ((0, h2 - height), (0, w2 - width), (0, 0))
            t, idx, missed = megakernel.cast_rays(
                frozen, cfg, jnp.pad(o, pw, mode="edge"),
                jnp.pad(d, pw, mode="edge"))
            return (t[:height, :width], idx[:height, :width],
                    missed[:height, :width])
        return megakernel.cast_rays(frozen, cfg, o, d)

    return cast


def is_visible(scene, cfg, from_pos, to_pos, sdf_march=None, cast_fn=None):
    """Shadow-ray visibility (raytracer.glsl:1389-1414): occluders that are
    themselves lights don't block."""
    if cast_fn is None:
        cast_fn = _default_cast(scene, cfg, sdf_march)
    sd = to_pos - from_pos
    dist = vm.safe_length(sd)
    close = dist < cfg.epsilon * 10.0
    sdir = sd / dist[..., None]
    t, idx, missed = cast_fn(from_pos + sdir * (cfg.epsilon * 2.0), sdir)
    blocked = (t < dist - cfg.epsilon * 2.0) & ~missed
    is_light_tab = (scene.mat_type == MatType.LIGHT)
    blocker_is_light = _row_select(
        idx, is_light_tab.astype(jnp.float32)[:, None])[..., 0] > 0.0
    return close | ~blocked | (blocked & blocker_is_light)


def finalize_reservoir(r, hit_pos, hit_normal, mat_c, mat_nt, mat_type,
                       visible):
    """W = weight_sum/(p̂·clamp(M,1,40)) with age/M bias corrections,
    visibility, W clamp [0,12], NaN guard (raytracer.glsl:1525-1576)."""
    p_hat = evaluate_target(r["light_pos"], r["light_color"], hit_pos,
                            hit_normal, mat_c, mat_nt, mat_type)
    good = (r["weight_sum"] > 0.0) & (r["m"] > 0.0) & (p_hat > 0.0) & visible

    m_cl = jnp.clip(r["m"], 1.0, 40.0)
    raw_w = r["weight_sum"] / jnp.maximum(p_hat * m_cl, 1e-12)

    bias = jnp.ones_like(raw_w)
    norm_age = jnp.clip(r["age"] / MAX_RESERVOIR_AGE, 0.0, 1.0)
    bias = bias * jnp.where(r["age"] > 0.0,
                            vm.mix(0.85, 1.0, 1.0 - norm_age * 0.3), 1.0)
    bias = bias * jnp.where(m_cl > 16.0, vm.safe_sqrt(16.0 / m_cl), 1.0)

    w = jnp.clip(bias * raw_w, 0.0, 12.0)
    w = jnp.where(jnp.isfinite(w), w, 0.0)
    out = dict(r)
    out["w"] = jnp.where(good, w, 0.0)
    return out


def _res_tree(res: "render.state.Reservoirs"):
    return dict(light_pos=res.light_pos, light_color=res.light_color,
                weight_sum=res.weight_sum, m=res.m, w=res.w, age=res.age,
                light_index=res.light_index)


def _gather_pixels(res_dict, rows, cols):
    """Gather reservoir fields at integer pixel coords [H, W] -> [H, W]."""
    return {k: v[rows, cols] for k, v in res_dict.items()}


def _shade_selected(scene, cfg, slot_map, x, nl, pix, pass_idx, sample_idx,
                    depth, sdf_march, render_mode, time_s, cast_fn=None):
    """calcDirectLighting for a per-pixel selected light slot
    (raytracer.glsl:1779 → 1174-1230), vectorized over traced indices.
    Sphere lights only take the cone-sampling branch; SDF lights the
    bound-point branch."""
    if cast_fn is None:
        cast_fn = _default_cast(scene, cfg, sdf_march)
    slot = jnp.clip(slot_map, 0, scene.num_lights - 1)

    # Light-slot properties via one-hot row select (see _row_select).
    li_arr = jnp.maximum(scene.light_idx, 0)
    shade_tab = jnp.concatenate([
        scene.pos[li_arr], scene.joker[li_arr],
        (scene.mesh_type[li_arr] == MeshType.SPHERE)
        .astype(jnp.float32)[:, None]], axis=-1)
    srow = _row_select(slot, shade_tab)
    l_pos = srow[..., 0:3]
    l_joker = srow[..., 3:7]
    is_sphere = srow[..., 7] > 0.0

    u1, u2 = rng.uniform2(pix, pass_idx, sample_idx, depth,
                          rng.Stream.NEE_CONE, 77)
    sw = l_pos - x
    d2 = vm.vdot(sw, sw)
    r2 = l_joker[..., 0] * l_joker[..., 0]
    cos_a_max = vm.safe_sqrt(1.0 - jnp.clip(vm.safe_div(r2, d2), 0.0, 1.0))
    dir_sphere = smp.sample_cone(vm.normalize(sw), 1.0 - cos_a_max, u1, u2)

    su1, su2 = rng.uniform2(pix, pass_idx, sample_idx, depth,
                            rng.Stream.NEE_SDF_POINT, 77)
    pt = smp.random_sphere_direction(su1, su2)
    dir_sdf = vm.normalize(l_pos + pt * l_joker[..., :3] - x)

    sr_dir = vm.where3(is_sphere, dir_sphere, dir_sdf)
    t, idx, missed = cast_fn(x + nl * cfg.epsilon, sr_dir)
    cast_tab = jnp.concatenate([
        scene.color, scene.emission,
        (scene.mat_type == MatType.LIGHT).astype(jnp.float32)[:, None]],
        axis=-1)
    crow = _row_select(idx, cast_tab)
    hit_is_light = (crow[..., 6] > 0.0) & ~missed
    lit_c = jnp.maximum(crow[..., 0:3], 0.001)
    lit_e = crow[..., 3:6]
    cos_term = jnp.maximum(0.001, vm.vdot(sr_dir, nl))
    if cfg.use_volumetrics:
        t_fog = jnp.exp(-cfg.vol_sigma_t * t)
    else:
        t_fog = jnp.ones_like(t)
    weight = jnp.where(is_sphere, 2.0 * (1.0 - cos_a_max), 1.0)
    fog = jnp.where(is_sphere, t_fog, 1.0)
    contrib = lit_c * lit_e * (weight * cos_term * fog)[..., None]
    return jnp.where(hit_is_light[..., None], contrib, 0.0)


def make_sampler(state, height, width, sdf_march, time_s=0.0,
                 cast_fn=None):
    """Build the `restir_sampler` hook for `integrator.trace`, closed over
    the frame's history state (`RenderState.restir_*`)."""
    back = _res_tree(state.restir_back)
    hist = [_res_tree(state.restir_hist1), _res_tree(state.restir_hist2)]
    return make_sampler_from_trees(back, hist, height, width, sdf_march,
                                   time_s, cast_fn=cast_fn)


def make_sampler_from_trees(back, hist, height, width, sdf_march,
                            time_s=0.0, row0=0, pad=0, cast_fn=None):
    """Sampler over explicit reservoir trees.

    `height`/`width` are the *global* image dims.  For tile sharding the
    trees are local row bands padded with `pad` exchanged halo rows on
    each side (parallel.halo), and `row0` is the shard's first global
    row; gathers translate global rows into the padded band and reject
    taps that fall outside the exchanged halo.
    """

    def sampler(scene, cfg, hit, nl, mask, pix, pass_idx, sample_idx, depth):
        out, res = reservoir_direct(
            scene, cfg, back, hist, hit.pos, nl, hit.idx, pix,
            pass_idx, sample_idx, depth, height=height, width=width,
            row0=row0, pad=pad, time_s=time_s, sdf_march=sdf_march,
            cast_fn=cast_fn)
        return out * mask, res

    return sampler


def reservoir_direct(scene, cfg, back, hist, x, nl, mat_idx, pix,
                     pass_idx, sample_idx, depth, *, height, width,
                     row0=0, pad=0, time_s=0.0, sdf_march=None,
                     cast_fn=None):
    """The full per-vertex reservoir pipeline (candidate generation →
    temporal reuse → spatial reuse → finalize + shade), raytracer.glsl:
    1619-1801, on explicit shading inputs.

    `depth` may be a scalar (wavefront integrator) or a per-lane array
    (megakernel G-buffer split — each lane's diffuse vertex sits at its
    own bounce depth); the RNG folds either shape identically, so both
    callers draw the same per-lane streams.  Returns
    (direct radiance *excluding* the throughput mask, reservoir dict).
    """
    local_h = back["m"].shape[0]
    # Taps read the packed [local_h, W, 11] form (see _pack_res): one
    # gather/roll per tap instead of seven.
    back_p = _pack_res(back)
    hist_p = [_pack_res(h) for h in hist]

    def band_gather(packed, grow, gcol):
        """Gather at global (row, col); returns (fields, in_band mask)."""
        lr = grow - row0 + pad
        in_band = (lr >= 0) & (lr < local_h)
        lr = jnp.clip(lr, 0, local_h - 1)
        return _unpack_res(packed[lr, gcol]), in_band

    batch = x.shape[:-1]
    # The spatial Poisson taps have *static* pixel offsets, and both
    # callers shade a row-major [rows, width] grid (render_sample* via
    # rng.pixel_ids; the sharded sampler via the shard's band of it), so
    # output pixel (p, c) reads band cell (p + pad + drow, c + dcol): a
    # roll (two slices on TPU) instead of a per-pixel gather.  XLA
    # gathers dominated the reservoir phases on TPU (~30 ms of a 512²
    # pass); rolls make the taps bandwidth-cost only.  Wrapped lanes are
    # rejected by the in_band / in-bounds masks, matching band_gather's
    # clip-then-mask semantics.
    grid_tap = (len(batch) == 2 and batch[1] == width
                and not _FORCE_GATHER_TAPS)

    def band_tap_static(packed, drow, dcol):
        """Neighbor tap at a compile-time (drow, dcol) offset."""
        lr = jnp.arange(batch[0])[:, None] + (pad + drow)
        in_band = jnp.broadcast_to((lr >= 0) & (lr < local_h), batch)
        out = jnp.roll(packed, (-(pad + drow), -dcol), axis=(0, 1))[:batch[0]]
        return _unpack_res(out), in_band
    rows = (pix // jnp.uint32(width)).astype(jnp.int32)
    cols = (pix % jnp.uint32(width)).astype(jnp.int32)
    L = scene.num_lights
    animated = int(cfg.render_mode) == 1

    # Winner-mesh material via one-hot row select (_row_select): per-lane
    # gathers from these tiny tables dominated the candidate phase.
    mesh_tab = jnp.concatenate([
        scene.color, jnp.abs(scene.ior)[:, None],
        scene.mat_type.astype(jnp.float32)[:, None]], axis=-1)
    mrow = _row_select(mat_idx, mesh_tab)
    mat_c = mrow[..., 0:3]
    mat_nt = mrow[..., 3]
    mat_ty = mrow[..., 4].astype(jnp.int32)

    # Light-slot table: pos, color*emission, validity.  The [L]-sized
    # gathers building it are array-level (cheap); per-lane lookups then
    # take the one-hot path.  Scene is pre-animated by render_sample, so
    # positions are already the getAnimatedPosition values (1645, 1672).
    li_arr = jnp.maximum(scene.light_idx, 0)
    light_tab = jnp.concatenate([
        scene.pos[li_arr],
        scene.color[li_arr] * scene.emission[li_arr],
        (scene.light_idx >= 0).astype(jnp.float32)[:, None]], axis=-1)

    def light_data(slot):
        row = _row_select(slot, light_tab)
        return row[..., 0:3], row[..., 3:6], row[..., 6] > 0.0

    import os as _os
    _ablate = set(_os.environ.get("RT0_RESTIR_ABLATE", "").split(","))
    # ---- Phase 1: candidate generation (1630-1654) ----
    res = empty_reservoir(batch)
    eff = min(cfg.restir_samples, max(4, L))
    for i in range(0 if 'candidates' in _ablate else eff):
        r1, r2 = rng.uniform2(pix, pass_idx, sample_idx, depth, i,
                              rng.Stream.RESTIR_CANDIDATE)
        slot = jnp.clip((r1 * L).astype(jnp.int32), 0, L - 1)
        lp, lc, l_ok = light_data(slot)
        tv = evaluate_target(lp, lc, x, nl, mat_c, mat_nt, mat_ty)
        tv = jnp.where(l_ok, tv, 0.0)
        res = update_reservoir(res, lp, lc, slot, tv, r2)

    # ---- Phase 2: temporal reuse, 2 history levels (1656-1709) ----
    frame_ok = pass_idx > MAX_TEMPORAL_SAMPLES
    for level in range(0 if 'temporal' in _ablate else MAX_TEMPORAL_SAMPLES):
        if cfg.restir_adhoc_motion:
            ju, jv = rng.uniform2(pix, pass_idx, sample_idx, depth, level,
                                  rng.Stream.RESTIR_TEMPORAL)
            # ad-hoc motion vector + jitter reprojection (1486-1496)
            motion_scale = 0.001 * (level + 1)
            mx = (x[..., 0] - 0.0) * motion_scale
            my = (x[..., 1] - 0.0) * motion_scale
            uv_x = (cols.astype(jnp.float32) + 0.5) / width \
                + mx + (ju - 0.5) * 0.002
            uv_y = (rows.astype(jnp.float32) + 0.5) / height \
                + my + (jv - 0.5) * 0.002
            in_bounds = ((uv_x > 0.01) & (uv_x < 0.99)
                         & (uv_y > 0.01) & (uv_y < 0.99))
            pr = jnp.clip((uv_y * height).astype(jnp.int32), 0, height - 1)
            pc = jnp.clip((uv_x * width).astype(jnp.int32), 0, width - 1)
            h_res, in_band = band_gather(hist_p[level], pr, pc)
        else:
            # identity reprojection (default): the camera is static while
            # accumulating (any move clears state), so the pixel's history
            # is its own — no gather, no edge rejection (PARITY.md; the
            # reference's offset is an acknowledged ad-hoc placeholder,
            # raytracer.glsl:1486-1496)
            in_bounds = jnp.ones_like(rows, bool)
            if grid_tap:
                h_res, in_band = band_tap_static(hist_p[level], 0, 0)
            else:
                h_res, in_band = band_gather(hist_p[level], rows, cols)

        ok = is_valid_reservoir(h_res, L) & in_bounds & in_band & frame_ok
        ok &= (h_res["m"] > 0.0) & (h_res["age"] < MAX_RESERVOIR_AGE)

        if animated:
            # refresh stored light data from current animation (1669-1676)
            slot_h = jnp.clip(h_res["light_index"], 0, L - 1)
            lp_now, lc_now, _ = light_data(slot_h)
            valid_slot = h_res["light_index"] >= 0
            h_res["light_pos"] = vm.where3(valid_slot, lp_now, h_res["light_pos"])
            h_res["light_color"] = vm.where3(valid_slot, lc_now, h_res["light_color"])

        h_res["age"] = h_res["age"] + (level + 1.0)
        alpha = TEMPORAL_ALPHA * (0.80 if level == 1 else 1.0) * \
            (0.85 if animated else 1.0)
        h_res["m"] = h_res["m"] * alpha
        h_res["weight_sum"] = h_res["weight_sum"] * alpha

        t_rand = rng.uniform(pix, pass_idx, sample_idx, depth, level,
                             rng.Stream.RESTIR_TEMPORAL, 991)
        res = combine_reservoirs(res, h_res, x, nl, mat_c, mat_nt, mat_ty,
                                 t_rand, L, source_ok=ok)

    # post-combine clamp (1705-1708)
    over = res["m"] > 100.0
    res["m"] = jnp.where(over, jnp.minimum(res["m"], 80.0), res["m"])
    res["weight_sum"] = jnp.where(over, res["weight_sum"] * 0.9,
                                  res["weight_sum"])

    # ---- Phase 3: spatial reuse (1711-1748) ----
    n_spatial = RESTIR_SPATIAL_SAMPLES
    if L > 10:
        n_spatial = max(4, n_spatial // 2)
    few_frames = jnp.asarray(pass_idx) < 10  # traced; handled via mask below
    for i in range(0 if 'spatial' in _ablate else n_spatial):
        s1, s2 = rng.uniform2(pix, pass_idx, sample_idx, depth, i,
                              rng.Stream.RESTIR_SPATIAL)
        dx, dy = POISSON_DISK[i]
        drow = int(round(dy * SPATIAL_RADIUS))
        dcol = int(round(dx * SPATIAL_RADIUS))
        nr = rows + drow
        ncol = cols + dcol
        in_b = (nr >= 0) & (nr < height) & (ncol >= 0) & (ncol < width)
        if grid_tap:
            n_res, in_band = band_tap_static(back_p, drow, dcol)
        else:
            n_res, in_band = band_gather(back_p, jnp.clip(nr, 0, height - 1),
                                         jnp.clip(ncol, 0, width - 1))

        ok = in_b & in_band & (n_res["m"] > 0.0)
        # warm-up halving (1721-1723): first frames use every other tap
        if i >= max(2, n_spatial // 2):
            ok &= ~few_frames
        # light-distance rejection (1737-1739)
        ld = n_res["light_pos"] - x
        ok &= ~((n_res["light_index"] >= 0) & (vm.vdot(ld, ld) > 225.0))
        # age + random rejection (1742-1744)
        age_thr = 2.0 if animated else MAX_RESERVOIR_AGE * 0.8
        ok &= ~(n_res["age"] > age_thr)
        ok &= ~(s1 < 0.03)

        res = combine_reservoirs(res, n_res, x, nl, mat_c, mat_nt, mat_ty,
                                 s2, L, source_ok=ok)

    # ---- Phase 4: finalize + shade (1750-1800) ----
    visible = is_visible(scene, cfg, x, res["light_pos"], sdf_march,
                         cast_fn=cast_fn)
    res = finalize_reservoir(res, x, nl, mat_c, mat_nt, mat_ty, visible)
    res["age"] = jnp.minimum(res["age"], MAX_RESERVOIR_AGE)

    slot_ok = (res["light_index"] >= 0) & (res["light_index"] < L)
    shade_ok = (res["w"] > 0.0) & slot_ok

    light_contrib = _shade_selected(
        scene, cfg, res["light_index"], x, nl, pix, pass_idx, sample_idx,
        depth, sdf_march, int(cfg.render_mode), time_s, cast_fn=cast_fn)

    eff_w = jnp.clip(res["w"], 0.0, 8.0)
    eff_w = eff_w * jnp.where(res["m"] > 30.0,
                              vm.safe_sqrt(30.0 / jnp.maximum(res["m"], 1e-6)),
                              1.0)
    out = light_contrib * eff_w[..., None]
    # NaN/Inf in any channel kills the whole contribution (1791-1793)
    all_fin = jnp.all(jnp.isfinite(out), axis=-1, keepdims=True)
    out = jnp.where(all_fin & shade_ok[..., None], out, 0.0)
    return out, res


def render_sample(scene, cfg, camera, state, height, width, pass_idx,
                  time_s=0.0):
    """One ReSTIR-enabled render pass: returns (mean radiance, new back
    reservoirs) — the MRT outputs of the reference kernel (2171-2179)."""
    from raytracer0_tpu.render import integrator
    from raytracer0_tpu.render.renderer import _get_sdf_march
    from raytracer0_tpu.render.state import Reservoirs

    scene_frame = scene_mod.animate_positions(scene, time_s, int(cfg.render_mode))
    sdf_march = _get_sdf_march(scene_frame)
    pix = rng.pixel_ids(height, width)
    # gradient-dead occlusion sweeps run on the Pallas cast kernel when
    # the scene/backend allow it (exactness argument: grad_safe_cast_fn)
    sampler = make_sampler(state, height, width, sdf_march, time_s,
                           cast_fn=grad_safe_cast_fn(scene_frame, cfg,
                                                     height, width))

    total = jnp.zeros((height, width, 3), jnp.float32)
    res_out = None
    for s in range(cfg.samples_per_pass):
        ro, rd = generate_rays(camera, height, width, pass_idx, sample_idx=s)
        rad, res_out = integrator.trace(
            scene_frame, cfg, ro, rd, pix, pass_idx, s,
            sdf_march=sdf_march, restir_sampler=sampler)
        total = total + rad
    new_back = Reservoirs(**res_out)
    return total / cfg.samples_per_pass, new_back


def render_sample_jit(scene, cfg, camera, state, height, width, pass_idx,
                      time_s=0.0):
    """jit-cached `render_sample`: pass index / time are traced, so a
    multi-frame loop compiles once (the Renderer already gets this via
    `render_pass`; direct callers and tests use this wrapper)."""
    import jax
    global _render_sample_jitted
    if _render_sample_jitted is None:
        _render_sample_jitted = jax.jit(
            render_sample, static_argnames=("cfg", "height", "width"))
    return _render_sample_jitted(scene, cfg, camera, state, height, width,
                                 jnp.uint32(pass_idx), jnp.float32(time_s))


_render_sample_jitted = None


def render_sample_fast(scene, cfg, camera, state, height, width, pass_idx,
                       time_s=0.0):
    """ReSTIR render pass on the Pallas fast path (VERDICT r1 next #1).

    Split execution, same math as `render_sample`:
      * path trace + G-buffer export: `megakernel.trace_forward_gbuffer`
        (the whole bounce loop block-resident in VMEM, no in-kernel NEE
        on diffuse vertices);
      * reservoir phases (candidate/temporal/spatial): `reservoir_direct`
        in XLA — pure VPU math + neighbor gathers, no intersections;
      * visibility + shading shadow rays: `megakernel.cast_rays`.

    The RNG streams key on (pixel, pass, sample, bounce depth, phase), so
    each lane draws the same randoms as the wavefront integrator path —
    results agree per-pixel up to f32 reassociation at shadow-threshold
    edges.  Requires `megakernel.supported_restir(scene, cfg)`.
    """
    from raytracer0_tpu.ops import megakernel
    from raytracer0_tpu.render.state import Reservoirs

    scene_frame = scene_mod.animate_positions(scene, time_s,
                                              int(cfg.render_mode))
    pix = rng.pixel_ids(height, width)
    back = _res_tree(state.restir_back)
    hist = [_res_tree(state.restir_hist1), _res_tree(state.restir_hist2)]

    def cast_fn(o, d):
        return megakernel.cast_rays(scene_frame, cfg, o, d)

    total = jnp.zeros((height, width, 3), jnp.float32)
    res_out = None
    for s in range(cfg.samples_per_pass):
        ro, rd = generate_rays(camera, height, width, pass_idx, sample_idx=s)
        rad, gbuf = megakernel.trace_forward_gbuffer(
            scene_frame, cfg, ro, rd, pix, pass_idx, s)

        direct = jnp.zeros((height, width, 3), jnp.float32)
        res_cur = empty_reservoir((height, width))
        for slot in gbuf:  # ascending diffuse ordinal: last valid wins
            out, res = reservoir_direct(
                scene_frame, cfg, back, hist, slot["pos"], slot["nl"],
                slot["idx"], pix, pass_idx, s,
                slot["depth"].astype(jnp.uint32),
                height=height, width=width, time_s=time_s, cast_fn=cast_fn)
            v = slot["valid"]
            direct = direct + jnp.where(v[..., None], out * slot["mask"], 0.0)
            res_cur = _where_res(v, res, res_cur)

        if cfg.use_spectral:
            # the integrator scales the *whole* per-sample radiance by the
            # hero-wavelength RGB weight (raytracer.glsl:2153-2155);
            # trace_forward_gbuffer already scaled `rad`
            from raytracer0_tpu.ops import spectral
            wl = spectral.sample_wavelength(
                rng.uniform(pix, pass_idx, s, rng.Stream.WAVELENGTH))
            direct = direct * spectral.wavelength_to_rgb(wl)

        total = total + rad + direct
        res_out = res_cur
    return total / cfg.samples_per_pass, Reservoirs(**res_out)


def _pack5(res_tree):
    """Reservoirs tree → the fused kernel's [5, H, W] packed state
    (megakernel._RES_CH order: ws, m, w, age, light_index-as-f32)."""
    return jnp.stack([
        res_tree["weight_sum"], res_tree["m"], res_tree["w"],
        res_tree["age"], res_tree["light_index"].astype(jnp.float32)])


def _unpack5(scene, res5):
    """[5, H, W] packed state → Reservoirs, re-deriving light_pos /
    light_color from the light index (they are pure functions of it —
    candidate generation stores the slot table's center/color and
    temporal/spatial merges only move stored values, restir.py:419-426;
    a -1 index yields the empty reservoir's zeros)."""
    idx = res5[4].astype(jnp.int32)
    li_arr = jnp.maximum(scene.light_idx, 0)
    pos_tab = scene.pos[li_arr]
    col_tab = scene.color[li_arr] * scene.emission[li_arr]
    live = idx >= 0
    pos = jnp.where(live[..., None], _row_select(
        jnp.maximum(idx, 0), pos_tab), 0.0)
    col = jnp.where(live[..., None], _row_select(
        jnp.maximum(idx, 0), col_tab), 0.0)
    from raytracer0_tpu.render.state import Reservoirs
    return Reservoirs(light_pos=pos, light_color=col,
                      weight_sum=res5[0], m=res5[1], w=res5[2],
                      age=res5[3], light_index=idx)


def render_sample_fused(scene, cfg, camera, state, height, width, pass_idx,
                        time_s=0.0):
    """ReSTIR render pass on the fused megakernel (VERDICT r3 next #1):
    path trace + all reservoir phases + reservoir shading in one Pallas
    launch (megakernel.trace_forward_restir_fused).  Same RNG streams
    and phase math as `render_sample`, which remains the semantics
    oracle (parity test: tests/test_restir.py).  Requires
    `megakernel.supported_restir_fused(scene, cfg)`."""
    from raytracer0_tpu.ops import megakernel
    from raytracer0_tpu.models.camera import generate_rays as _gen

    scene_frame = scene_mod.animate_positions(scene, time_s,
                                              int(cfg.render_mode))
    pix = rng.pixel_ids(height, width)
    back5 = _pack5(_res_tree(state.restir_back))
    hist5 = jnp.stack([_pack5(_res_tree(state.restir_hist1)),
                       _pack5(_res_tree(state.restir_hist2))])

    total = jnp.zeros((height, width, 3), jnp.float32)
    res5_out = None
    for s in range(cfg.samples_per_pass):
        ro, rd = _gen(camera, height, width, pass_idx, sample_idx=s)
        rad, res5_out = megakernel.trace_forward_restir_fused(
            scene_frame, cfg, ro, rd, pix, pass_idx, s, back5, hist5)
        if cfg.use_spectral:
            # whole-frame hero-wavelength scaling (raytracer.glsl:
            # 2153-2155) — the kernel's radiance already includes the
            # reservoir direct light, so one scale covers both
            from raytracer0_tpu.ops import spectral
            wl = spectral.sample_wavelength(
                rng.uniform(pix, pass_idx, s, rng.Stream.WAVELENGTH))
            rad = rad * spectral.wavelength_to_rgb(wl)
        total = total + rad
    return total / cfg.samples_per_pass, _unpack5(scene_frame, res5_out)

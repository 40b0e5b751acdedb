"""REBLUR pass kernels - TPU rebuilds of Shaders/Include/REBLUR_*.hlsli.

This module implements the REBLUR pass set as pure jnp image functions:
  classify_tiles, hit_dist_reconstruction, pre_pass, temporal_accumulation, history_fix,
  spatial_blur (BLUR / POST_BLUR modes), temporal_stabilization, split_screen.

Shader permutations (239 compiled variants in the reference) become static python flags that
specialize under jit. The 4x4 gather dance of the HLSL (GatherRed + .wzxy swizzles,
REBLUR_TemporalAccumulation.hlsli:152-176) is re-derived here as an explicit 4x4 tap grid
rooted at (bilinear_origin - 1); see `gather_4x4`.

Deliberate divergences (SURVEY.md §7.3.5):
  - R16_UINT internal-data packing is stored as 3 quantized planes (same bit depths);
  - stochastic texture filtering (REBLUR_USE_STF) uses the same PCG hash family but not
    bit-identical random streams;
  - f16 curvature round-trip of Data2 is emulated via f32->f16->f32 cast.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ... import frontend as fe
from ... import math as nm
from ... import vec3 as v3
from ...frontend import NRD_EPS, NRD_INF
from ...ops import resample, stencil, tiles
from . import common as C


# ---------------------------------------------------------------------------
# Small helpers
# ---------------------------------------------------------------------------


def unpack_nr3(sc, packed, config):
    """unpack_nr returning a plane-wise V3 normal (see vec3.py for why)."""
    if config.normal_encoding.name == "R10_G10_B10_A2_UNORM":
        n3 = v3.decode_oct_raw(packed[..., 0], packed[..., 1])
        return n3, packed[..., 2], packed[..., 3] * 3.0
    n, r, m = unpack_nr(sc, packed, config)
    return v3.V3.of(n), r, m


def unpack_view_z(sc, z):
    return jnp.abs(z) * sc["view_z_scale"]


def gather_4x4(img, bilinear_origin):
    """16 taps of the 4x4 grid rooted at (bilinear_origin - 1). Returns taps[j][i]."""
    x0 = bilinear_origin[..., 0].astype(jnp.int32) - 1
    y0 = bilinear_origin[..., 1].astype(jnp.int32) - 1
    return [[resample.texel_fetch(img, x0 + i, y0 + j) for i in range(4)] for j in range(4)]


def gather_2x2_at(img, bilinear_origin):
    x0 = bilinear_origin[..., 0].astype(jnp.int32)
    y0 = bilinear_origin[..., 1].astype(jnp.int32)
    return [resample.texel_fetch(img, x0 + dx, y0 + dy) for dy, dx in
            ((0, 0), (0, 1), (1, 0), (1, 1))]


CENTER_TAPS = ((1, 1), (2, 1), (1, 2), (2, 2))            # bilinear 2x2 inside the 4x4
CORNER_TAPS = ((0, 0), (3, 0), (0, 3), (3, 3))
QUAD_OF_CENTER_TAP = (0, 1, 2, 3)


def unpack_nr(sc, packed, config):
    return fe.unpack_normal_roughness(packed, config.normal_encoding,
                                      config.roughness_encoding)


# ---------------------------------------------------------------------------
# ClassifyTiles (REBLUR_ClassifyTiles.cs.hlsl:22-55)
# ---------------------------------------------------------------------------


@jax.named_scope("REBLUR/classify_tiles")
def classify_tiles(sc, view_z):
    return tiles.classify_sky_tiles(unpack_view_z(sc, view_z), sc["denoising_range"])


def sky_pixel_mask(sc, tile_map, view_z):
    """Combined early-out mask: sky tile or beyond denoising range (1 = skip)."""
    h, w = view_z.shape
    sky = tiles.tile_upsample_nearest(tile_map, h, w)
    return jnp.logical_or(sky > 0.0, unpack_view_z(sc, view_z) > sc["denoising_range"])


# ---------------------------------------------------------------------------
# TemporalAccumulation (REBLUR_TemporalAccumulation.hlsli) - diffuse core
# ---------------------------------------------------------------------------


@jax.named_scope("REBLUR/surface_motion_reprojection")
def surface_motion_reprojection(sc, dc, view_z_in, normal_roughness, mv_in, prev_view_z,
                                prev_normal_roughness, prev_internal, config,
                                disocclusion_threshold_mix=None):
    """The shared surface-motion machinery of TA (lines 131-305).

    Returns a dict with everything both the diffuse and specular halves consume.
    prev_internal: dict(diff_accum, spec_accum, material_id) planes.
    """
    h, w = view_z_in.shape
    uv = resample.pixel_uv_grid(h, w)
    view_z = unpack_view_z(sc, view_z_in)

    n, roughness, material_id = unpack_nr(sc, normal_roughness, config)

    xv = nm.reconstruct_view_position(uv, sc["frustum"][None, None, :], view_z,
                                      sc["ortho_mode"])
    v2w = jnp.asarray(sc["view_to_world"])
    x = xv @ v2w[:3, :3].T  # RotateVector (translation is 0, camera-relative)

    # Navg over the 2x2 at offsets {-1, 0} (lines 70-97); unnormalized
    n_avg = jnp.zeros_like(n)
    for dy, dx in ((-1, -1), (-1, 0), (0, -1), (0, 0)):
        ns, _, _ = unpack_nr(sc, stencil.shifted(normal_roughness, dy, dx), config)
        n_avg = n_avg + ns
    n_avg = n_avg / 4.0

    # previous position / surface motion uv (lines 131-150)
    mv = mv_in * sc["mv_scale"][None, None, :3]
    w2v_prev = jnp.asarray(sc["world_to_view_prev"])
    is_world_mv = sc["mv_scale"][3] != 0.0

    smb_uv_screen = uv + mv[..., :2]
    mv_z_computed = (x @ w2v_prev[:3, :3].T + w2v_prev[:3, 3])[..., 2] - view_z
    mv_z = jnp.where(sc["mv_scale"][2] == 0.0, mv_z_computed, mv[..., 2])
    view_z_prev = view_z + mv_z
    xv_prev_local = nm.reconstruct_view_position(
        smb_uv_screen, sc["frustum_prev"][None, None, :], view_z_prev, sc["ortho_mode"])
    x_prev_screen = xv_prev_local @ w2v_prev[:3, :3] + sc["camera_delta"][None, None, :]

    x_prev_world = x + mv
    smb_uv_world = nm.get_screen_uv(jnp.asarray(sc["world_to_clip_prev"]), x_prev_world)

    x_prev = jnp.where(is_world_mv, x_prev_world, x_prev_screen)
    smb_pixel_uv = jnp.where(is_world_mv, smb_uv_world, smb_uv_screen)

    rect_prev = sc["rect_size_prev"][None, None, :]
    bilinear_origin, bilinear_frac = nm.bilinear_filter(smb_pixel_uv, rect_prev)

    # 4x4 prev viewZ (lines 152-176)
    z_taps = gather_4x4(prev_view_z, bilinear_origin)
    z_taps = [[unpack_view_z(sc, t) for t in row] for row in z_taps]

    # prev normal average over center 2x2, weighted by in-range (lines 178-204)
    nr_taps = gather_2x2_at(prev_normal_roughness, bilinear_origin)
    smb_navg = jnp.zeros_like(n)
    wsum = jnp.zeros_like(view_z)
    for tap_idx, (tx, ty) in enumerate(CENTER_TAPS):
        w_ = (z_taps[ty][tx] < sc["denoising_range"]).astype(jnp.float32)
        npv, _, _ = unpack_nr(sc, nr_taps[tap_idx], config)
        smb_navg = smb_navg + npv * w_[..., None]
        wsum = wsum + w_
    smb_navg = smb_navg / jnp.where(wsum == 0.0, 1.0, wsum)[..., None]
    smb_navg = smb_navg @ jnp.asarray(sc["world_prev_to_world"])[:3, :3].T

    # parallax (lines 206-211)
    cam_delta = sc["camera_delta"][None, None, :]
    uv_zp1 = jnp.where(sc["ortho_mode"] == 0.0, smb_pixel_uv, uv)
    uv_zp2 = jnp.where(sc["ortho_mode"] == 0.0, uv, smb_pixel_uv)
    p1_uv = nm.get_screen_uv(jnp.asarray(sc["world_to_clip_prev"]), x_prev + cam_delta)
    p2_uv = nm.get_screen_uv(jnp.asarray(sc["world_to_clip"]), x_prev - cam_delta)
    rect = sc["rect_size"][None, None, :]
    parallax1 = nm.length((p1_uv - uv_zp1) * rect)
    parallax2 = nm.length((p2_uv - uv_zp2) * rect)
    parallax_max = jnp.maximum(parallax1, parallax2)
    parallax_min = jnp.minimum(parallax1, parallax2)

    # disocclusion threshold (lines 213-234)
    pixel_size = nm.pixel_radius_to_world(sc["unproject"], sc["ortho_mode"], 1.0, view_z)
    frustum_size = nm.get_frustum_size(sc["min_rect_dim_mul_unproject"], sc["ortho_mode"],
                                       view_z)

    mix_ = jnp.where(material_id == sc["strand_material_id"],
                     fe.get_normalized_strand_thickness(sc["strand_thickness"], pixel_size),
                     0.0)
    if disocclusion_threshold_mix is not None:
        mix_ = disocclusion_threshold_mix
    disocclusion_threshold = nm.lerp(sc["disocclusion_threshold"]
                                     + sc["disocclusion_threshold_bonus"],
                                     sc["disocclusion_threshold_alternate"]
                                     + sc["disocclusion_threshold_bonus"], mix_)

    small_parallax = nm.linearstep(0.25, 0.0, parallax_max)
    disocclusion_threshold = disocclusion_threshold + 0.05 * small_parallax

    v = C.get_view_vector(sc, x)
    nov = jnp.abs(nm.dot(n, v))
    nov_strict = nm.lerp(nov, 1.0, nm.saturate(parallax_max / 30.0))
    base_threshold = nm.get_disocclusion_threshold(disocclusion_threshold, frustum_size,
                                                   nov_strict)
    navg_ok = (nm.dot(smb_navg, n_avg)
               > C.REBLUR_ALMOST_ZERO_ANGLE - 0.25 * small_parallax).astype(jnp.float32)
    in_screen4 = resample.is_in_screen_bilinear(bilinear_origin, sc["rect_size_prev"])
    quad_threshold = [base_threshold * navg_ok * in_screen4[..., q] - NRD_EPS
                      for q in range(4)]

    # plane distance occlusion for all 16 taps (lines 236-245)
    xv_prev = x_prev @ w2v_prev[:3, :3].T + w2v_prev[:3, 3]
    occ = [[None] * 4 for _ in range(4)]
    for j in range(4):
        for i in range(4):
            q = (1 if i >= 2 else 0) + (2 if j >= 2 else 0)
            plane_dist = jnp.abs(z_taps[j][i] - xv_prev[..., 2])
            occ[j][i] = (plane_dist <= quad_threshold[q]).astype(jnp.float32)

    # materialID occlusion (lines 247-269); internal data taps
    mat_taps = gather_4x4(prev_internal["material_id"], bilinear_origin)
    if config.normal_encoding.name == "R10_G10_B10_A2_UNORM":
        min_material = jnp.minimum(dc["spec_min_material"], dc["diff_min_material"])
        for j in range(4):
            for i in range(4):
                same = (jnp.maximum(material_id, min_material)
                        == jnp.maximum(mat_taps[j][i], min_material)).astype(jnp.float32)
                occ[j][i] = occ[j][i] * same

    # 2x2 occlusion weights + fbits (lines 271-278)
    occ_center = jnp.stack([occ[ty][tx] for tx, ty in CENTER_TAPS], -1)
    occlusion_weights = nm.get_bilinear_custom_weights(bilinear_frac, occ_center)
    occ12_sum = sum(occ[j][i] for j in range(4) for i in range(4)
                    if (i, j) not in CORNER_TAPS)
    allow_catrom = occ12_sum > 11.5

    fbits = (occ_center[..., 0] * 1.0 + occ_center[..., 1] * 2.0
             + occ_center[..., 2] * 4.0 + occ_center[..., 3] * 8.0)

    # accumulation speed (lines 280-294)
    diff_taps = gather_2x2_at(prev_internal["diff_accum"], bilinear_origin)
    spec_taps = gather_2x2_at(prev_internal["spec_accum"], bilinear_origin)
    diff_accum_speed = nm.apply_bilinear_custom_weights(
        diff_taps[0][..., None], diff_taps[1][..., None], diff_taps[2][..., None],
        diff_taps[3][..., None], occlusion_weights)[..., 0]
    spec_accum_speed = nm.apply_bilinear_custom_weights(
        spec_taps[0][..., None], spec_taps[1][..., None], spec_taps[2][..., None],
        spec_taps[3][..., None], occlusion_weights)[..., 0]

    # footprint quality (lines 296-305)
    smb_vprev = C.get_view_vector_prev(sc, x_prev)
    nov_prev = jnp.abs(nm.dot(n, smb_vprev))
    size_quality = (nov_prev + 1e-3) / (nov + 1e-3)
    size_quality = size_quality * size_quality
    size_quality = nm.lerp(0.1, 1.0, nm.saturate(size_quality))

    bw = nm.bilinear_weights(bilinear_frac)
    footprint_quality = jnp.sum(occ_center * bw, -1)
    footprint_quality = jnp.sqrt(nm.saturate(footprint_quality)) * size_quality

    return dict(
        uv=uv, view_z=view_z, n=n, roughness=roughness, material_id=material_id,
        x=x, xv=xv, v=v, nov=nov, n_avg=n_avg, smb_navg=smb_navg,
        x_prev=x_prev, xv_prev=xv_prev, smb_pixel_uv=smb_pixel_uv,
        parallax_max=parallax_max, parallax_min=parallax_min,
        pixel_size=pixel_size, frustum_size=frustum_size,
        occlusion_weights=occlusion_weights, allow_catrom=allow_catrom, fbits=fbits,
        diff_accum_speed=diff_accum_speed, spec_accum_speed=spec_accum_speed,
        footprint_quality=footprint_quality, bilinear_origin=bilinear_origin,
        smb_vprev=smb_vprev, dis_thr=disocclusion_threshold,
    )


def uv_to_mv_pix(uv_target, h, w, rect_prev):
    """Per-pixel motion in pixels of the prev grid, relative to this pixel's position."""
    uv = resample.pixel_uv_grid(h, w)
    rect = jnp.asarray([w, h], jnp.float32)[None, None, :]
    mv_pix = uv_target * rect_prev[None, None, :] - uv * rect
    return mv_pix[..., 1], mv_pix[..., 0]


@jax.named_scope("REBLUR/surface_motion_reprojection_pallas")
def surface_motion_reprojection_pallas(sc, dc, view_z_in, normal_roughness, mv_in,
                                       prev_view_z, prev_normal_roughness, prev_internal,
                                       config, hist_planes, bil_planes,
                                       disocclusion_threshold_mix=None,
                                       perf_mode=False, mesh=None):
    """surface_motion_reprojection with the gather work on the Pallas path.

    Same elementwise math as surface_motion_reprojection (kept line-parallel - any change
    there must be mirrored here); the 4x4/2x2 footprint gathers AND the CatRom/bilinear
    history sampling run in kernels/reblur_pallas.reblur_smb_resolve. hist_planes /
    bil_planes: (H, W) planes to sample CatRom-with-fallback / bilinear-custom; resolved
    results come back in sm["hist"] / sm["bil"] in order. R10G10B10A2 normals only."""
    from ...kernels.reblur_pallas import reblur_smb_resolve

    h, w = view_z_in.shape
    uv = resample.pixel_uv_grid(h, w)
    view_z = unpack_view_z(sc, view_z_in)
    n, roughness, material_id = unpack_nr(sc, normal_roughness, config)

    # plane-wise V3 math throughout (see vec3.py): (H, W, 3) intermediates are ~40x
    # slower on TPU than fused scalar-plane chains
    u_p, v_p = uv[..., 0], uv[..., 1]
    rw_, rh_ = sc["rect_size"][0], sc["rect_size"][1]
    xv3 = v3.reconstruct_view_position(u_p, v_p, sc["frustum"], view_z,
                                       sc["ortho_mode"])
    v2w = jnp.asarray(sc["view_to_world"])
    x3 = v3.rotate(v2w, xv3)

    mvs = sc["mv_scale"]
    mv0 = mv_in[..., 0] * mvs[0]
    mv1 = mv_in[..., 1] * mvs[1]
    mv2 = mv_in[..., 2] * mvs[2]
    w2v_prev = jnp.asarray(sc["world_to_view_prev"])
    is_world_mv = sc["mv_scale"][3] != 0.0

    smb_u_scr = u_p + mv0
    smb_v_scr = v_p + mv1
    mv_z_computed = v3.affine(w2v_prev, x3).z - view_z
    mv_z = jnp.where(sc["mv_scale"][2] == 0.0, mv_z_computed, mv2)
    view_z_prev = view_z + mv_z
    xv_prev_local3 = v3.reconstruct_view_position(smb_u_scr, smb_v_scr,
                                                  sc["frustum_prev"], view_z_prev,
                                                  sc["ortho_mode"])
    cd = sc["camera_delta"]
    cd3 = v3.V3(cd[0], cd[1], cd[2])
    x_prev_screen3 = v3.rotate_inv(w2v_prev, xv_prev_local3) + cd3

    x_prev_world3 = x3 + v3.V3(mv0, mv1, mv2)
    smb_u_wld, smb_v_wld = v3.get_screen_uv(jnp.asarray(sc["world_to_clip_prev"]),
                                            x_prev_world3)

    xp3 = v3.where(is_world_mv, x_prev_world3, x_prev_screen3)
    smb_u = jnp.where(is_world_mv, smb_u_wld, smb_u_scr)
    smb_v = jnp.where(is_world_mv, smb_v_wld, smb_v_scr)
    smb_pixel_uv = jnp.stack([smb_u, smb_v], -1)

    # parallax (lines 206-211)
    is_persp = sc["ortho_mode"] == 0.0
    zp1_u = jnp.where(is_persp, smb_u, u_p)
    zp1_v = jnp.where(is_persp, smb_v, v_p)
    zp2_u = jnp.where(is_persp, u_p, smb_u)
    zp2_v = jnp.where(is_persp, v_p, smb_v)
    p1u, p1v = v3.get_screen_uv(jnp.asarray(sc["world_to_clip_prev"]), xp3 + cd3)
    p2u, p2v = v3.get_screen_uv(jnp.asarray(sc["world_to_clip"]), xp3 - cd3)
    rect = sc["rect_size"][None, None, :]
    d1x = (p1u - zp1_u) * rw_
    d1y = (p1v - zp1_v) * rh_
    d2x = (p2u - zp2_u) * rw_
    d2y = (p2v - zp2_v) * rh_
    parallax1 = jnp.sqrt(d1x * d1x + d1y * d1y)
    parallax2 = jnp.sqrt(d2x * d2x + d2y * d2y)
    parallax_max = jnp.maximum(parallax1, parallax2)
    parallax_min = jnp.minimum(parallax1, parallax2)

    pixel_size = nm.pixel_radius_to_world(sc["unproject"], sc["ortho_mode"], 1.0, view_z)
    frustum_size = nm.get_frustum_size(sc["min_rect_dim_mul_unproject"], sc["ortho_mode"],
                                       view_z)

    mix_ = jnp.where(material_id == sc["strand_material_id"],
                     fe.get_normalized_strand_thickness(sc["strand_thickness"], pixel_size),
                     0.0)
    if disocclusion_threshold_mix is not None:
        mix_ = disocclusion_threshold_mix
    disocclusion_threshold = nm.lerp(sc["disocclusion_threshold"]
                                     + sc["disocclusion_threshold_bonus"],
                                     sc["disocclusion_threshold_alternate"]
                                     + sc["disocclusion_threshold_bonus"], mix_)

    small_parallax = nm.linearstep(0.25, 0.0, parallax_max)
    disocclusion_threshold = disocclusion_threshold + 0.05 * small_parallax

    vvw = sc["view_vector_world"]
    n3 = v3.V3.of(n)
    v_3 = v3.where(is_persp, v3.normalize(-x3),
                   v3.V3.full_like(view_z, vvw[0], vvw[1], vvw[2]))
    nov = jnp.abs(v3.dot(n3, v_3))
    nov_strict = nm.lerp(nov, 1.0, nm.saturate(parallax_max / 30.0))
    base_threshold = nm.get_disocclusion_threshold(disocclusion_threshold, frustum_size,
                                                   nov_strict)
    navg_thr = C.REBLUR_ALMOST_ZERO_ANGLE - 0.25 * small_parallax

    xv_prev3 = v3.affine(w2v_prev, xp3)

    mv_pix_y, mv_pix_x = uv_to_mv_pix(smb_pixel_uv, h, w, sc["rect_size_prev"])
    res = reblur_smb_resolve(
        sc, dc, config, use_catrom=not perf_mode,
        mv_pix_y=mv_pix_y, mv_pix_x=mv_pix_x,
        xv_prev_z=xv_prev3.z, base_threshold=base_threshold, navg_thr=navg_thr,
        material_id_center=material_id, nr_cur_packed=normal_roughness,
        prev_view_z=prev_view_z, prev_nr_packed=prev_normal_roughness,
        prev_mat=prev_internal["material_id"], diff_accum=prev_internal["diff_accum"],
        spec_accum=prev_internal["spec_accum"], hist_planes=hist_planes,
        bil_planes=bil_planes, mesh=mesh)

    # footprint quality (lines 296-305)
    vvwp = sc["view_vector_world_prev"]
    smb_vprev3 = v3.where(is_persp, v3.normalize(cd3 - xp3),
                          v3.V3.full_like(view_z, vvwp[0], vvwp[1], vvwp[2]))
    nov_prev = jnp.abs(v3.dot(n3, smb_vprev3))
    size_quality = (nov_prev + 1e-3) / (nov + 1e-3)
    size_quality = size_quality * size_quality
    size_quality = nm.lerp(0.1, 1.0, nm.saturate(size_quality))
    footprint_quality = jnp.sqrt(nm.saturate(res["footprint_raw"])) * size_quality

    return dict(
        uv=uv, view_z=view_z, n=n, roughness=roughness, material_id=material_id,
        x=x3.arr(), xv=xv3.arr(), v=v_3.arr(), nov=nov, n_avg=res["n_avg"],
        smb_navg=res["smb_navg"],
        x_prev=xp3.arr(), xv_prev=xv_prev3.arr(), smb_pixel_uv=smb_pixel_uv,
        parallax_max=parallax_max, parallax_min=parallax_min,
        pixel_size=pixel_size, frustum_size=frustum_size,
        occlusion_weights=None, allow_catrom=res["allow_catrom"] > 0.5,
        fbits=res["fbits"],
        diff_accum_speed=res["diff_accum_speed"], spec_accum_speed=res["spec_accum_speed"],
        footprint_quality=footprint_quality, bilinear_origin=None,
        smb_vprev=smb_vprev3.arr(), hist=res["hist"], bil=res["bil"],
        dis_thr=disocclusion_threshold,
    )


def sample_history(history, smb_pixel_uv, rect_size_prev, occlusion_weights, allow_catrom):
    """CatRom-13-tap with bilinear-custom-weights fallback on the history plane."""
    sample_pos = nm.saturate(smb_pixel_uv) * rect_size_prev[None, None, :]
    return resample.sample_catrom(history, sample_pos, allow_catrom, occlusion_weights)


def sample_history_bilinear(history, smb_pixel_uv, rect_size_prev, occlusion_weights):
    """_BilinearFilterWithCustomWeights_Color on the fast-history plane."""
    sample_pos = nm.saturate(smb_pixel_uv) * rect_size_prev[None, None, :]
    origin = jnp.floor(sample_pos - 0.5)
    return resample.bilinear_custom(history, origin, occlusion_weights)


@jax.named_scope("REBLUR/temporal_accumulation_diffuse")
def temporal_accumulation_diffuse(sc, dc, sm, diff_input, diff_history, diff_fast_history,
                                  config, diff_confidence=None, *, occlusion: bool,
                                  directional: bool = False, diff_sh_input=None,
                                  diff_sh_history=None, samples=None, has_data=True):
    """Diffuse half of TA (lines 826-930). Returns (diff_out, fast_out, accum_speed_out[,sh]).

    samples: optional dict(history, fast[, sh]) of pre-resolved reprojected samples from
    the Pallas path (surface_motion_reprojection_pallas); None -> XLA gathers."""
    diff_accum_speed = sm["diff_accum_speed"]

    diff_history_confidence = sm["footprint_quality"]
    if diff_confidence is not None:
        diff_history_confidence = diff_history_confidence * diff_confidence

    diff_accum_speed = diff_accum_speed * nm.lerp(diff_history_confidence, 1.0,
                                                  1.0 / (1.0 + diff_accum_speed))
    diff_accum_speed = jnp.minimum(diff_accum_speed, dc["max_accumulated_frame_num"])


    if samples is not None:
        smb_diff_history = samples["history"]
        smb_diff_fast = samples["fast"]
    else:
        smb_diff_history = sample_history(diff_history, sm["smb_pixel_uv"],
                                          sc["rect_size_prev"], sm["occlusion_weights"],
                                          sm["allow_catrom"])
        smb_diff_fast = sample_history_bilinear(diff_fast_history, sm["smb_pixel_uv"],
                                                sc["rect_size_prev"],
                                                sm["occlusion_weights"])
    smb_diff_history = C.clamp_negative_to_zero(smb_diff_history, occlusion, directional)

    diff_nlas = 1.0 / (1.0 + diff_accum_speed)
    if not (isinstance(has_data, bool) and has_data):
        # checkerboard: slower accumulation on no-data pixels (TA :878-880)
        adj = diff_nlas * nm.lerp(1.0 - sc["checkerboard_resolve_accum_speed"], 1.0,
                                  diff_nlas)
        diff_nlas = jnp.where(has_data, diff_nlas, adj)
    # directional occlusion uses the float4 mix (xyz: f, w: max(f, limit)) - Common.hlsli:175-182
    diff_result = C.mix_history_and_current(dc, smb_diff_history, diff_input, diff_nlas,
                                            jnp.ones_like(diff_nlas),
                                            occlusion and not directional)
    sh_result = None
    if diff_sh_input is not None:
        if samples is not None:
            smb_sh = samples["sh"]
        else:
            smb_sh = sample_history_bilinear(diff_sh_history, sm["smb_pixel_uv"],
                                             sc["rect_size_prev"],
                                             sm["occlusion_weights"])
        sh_result = C.mix_history_and_current(dc, smb_sh, diff_sh_input, diff_nlas,
                                              jnp.ones_like(diff_nlas), False)

    # firefly suppressor (lines 888-903)
    if not occlusion and not directional:
        max_rel = (dc["firefly_suppressor_min_relative_scale"]
                   + C.REBLUR_FIREFLY_SUPPRESSOR_MAX_RELATIVE_INTENSITY
                   / (diff_accum_speed + 1.0))
        antifirefly = diff_accum_speed * dc["max_blur_radius"] \
            * C.REBLUR_FIREFLY_SUPPRESSOR_RADIUS_SCALE
        antifirefly = antifirefly / (1.0 + antifirefly)
        luma = C.get_luma(diff_result, False)
        luma_clamped = jnp.minimum(luma, C.get_luma(smb_diff_history, False) * max_rel)
        luma_clamped = nm.lerp(luma, luma_clamped, antifirefly)
        diff_result = C.change_luma(diff_result, luma_clamped, False)
        if sh_result is not None:
            scale = C.get_luma_scale(nm.length(sh_result[..., :3]), luma_clamped)
            sh_result = jnp.concatenate(
                [sh_result[..., :3] * scale[..., None], sh_result[..., 3:]], -1)

    # fast history (lines 911-924)
    fast_accum_speed = jnp.minimum(diff_accum_speed, dc["max_fast_accumulated_frame_num"])
    fast_nlas = 1.0 / (1.0 + fast_accum_speed)
    if not (isinstance(has_data, bool) and has_data):
        adj = fast_nlas * nm.lerp(1.0 - sc["checkerboard_resolve_accum_speed"], 1.0,
                                  fast_nlas)
        fast_nlas = jnp.where(has_data, fast_nlas, adj)
    fast_result = nm.lerp(smb_diff_fast, C.get_luma(diff_input, occlusion or directional),
                          fast_nlas)
    if not occlusion and not directional:
        fast_clamped = jnp.minimum(
            fast_result, C.get_luma(smb_diff_history, False) * max_rel
            * C.REBLUR_FIREFLY_SUPPRESSOR_FAST_RELATIVE_INTENSITY)
        fast_result = nm.lerp(fast_result, fast_clamped, antifirefly)

    return diff_result, fast_result, diff_accum_speed, sh_result


# ---------------------------------------------------------------------------
# HistoryFix (REBLUR_HistoryFix.hlsli) - diffuse path
# ---------------------------------------------------------------------------


@jax.named_scope("REBLUR/history_fix")
def history_fix(sc, dc, view_z_in, normal_roughness, data1_diff, data1_spec, signal,
                fast_history, config, *, is_diffuse: bool, occlusion: bool,
                anti_firefly: bool = False, sh=None, directional: bool = False,
                pallas: bool = False, perf_mode: bool = False):
    """Sparse 5x5-no-corners history reconstruction + fast-history color clamping.

    signal: (h, w, c) output of TA; fast_history: (h, w). Returns (signal_out, fast_out[,sh]).
    pallas=True runs the taps + fast-history stencils in kernels/reblur_pallas.
    """
    h, w = view_z_in.shape
    uv = resample.pixel_uv_grid(h, w)
    view_z = unpack_view_z(sc, view_z_in)
    n3, roughness, material_id = unpack_nr3(sc, normal_roughness, config)
    frustum_size = nm.get_frustum_size(sc["min_rect_dim_mul_unproject"], sc["ortho_mode"],
                                       view_z)
    u_p, v_p = uv[..., 0], uv[..., 1]
    xv3 = v3.reconstruct_view_position(u_p, v_p, sc["frustum"], view_z,
                                       sc["ortho_mode"])
    w2v = jnp.asarray(sc["world_to_view"])
    nv3 = v3.rotate(w2v, n3)
    n = n3.arr()
    nv = nv3.arr()

    frame_num = data1_diff if is_diffuse else data1_spec
    stride = dc["history_fix_base_pixel_stride"] / (2.0 + frame_num)
    if is_diffuse:
        stride = stride * (frame_num < dc["history_fix_frame_num"]).astype(jnp.float32)
    else:
        smc = nm.get_spec_magic_curve(roughness)
        stride = stride * (frame_num < dc["history_fix_frame_num"]).astype(jnp.float32)
        stride = stride * nm.lerp(0.5, 1.0, smc)
    stride = jnp.floor(stride)

    nlas = 1.0 / (1.0 + frame_num)
    enc_err = nm.normal_encoding_error(int(config.normal_encoding))
    normal_weight_param = nm.get_normal_weight_param(
        nlas, dc["lobe_angle_fraction"],
        roughness if not is_diffuse else jnp.ones_like(roughness), enc_err)
    ga = 1.0 / (dc["plane_dist_sensitivity"] * frustum_size)
    gb = -v3.dot(nv3, xv3) * ga
    if not is_diffuse:
        ra, rb = nm.get_relaxed_roughness_weight_params(
            roughness * roughness, jnp.sqrt(dc["roughness_fraction"]))

    hit_dist_scale = fe.get_hit_distance_normalization(
        view_z, dc["hit_dist_params"][None, None, :],
        jnp.ones_like(roughness) if is_diffuse else roughness)
    hit_dist = C.extract_hit_dist(signal) * hit_dist_scale
    hit_dist_factor = nm.get_hit_dist_factor(hit_dist, frustum_size)
    ha, hb = nm.get_hit_distance_weight_params(
        hit_dist_factor, nlas, jnp.ones_like(roughness) if is_diffuse else roughness)

    if pallas:
        from ...kernels import get_history_fix

        history_fix_taps_pallas = get_history_fix()

        data1 = data1_diff if is_diffuse else data1_spec
        kw = {}
        if not is_diffuse:
            ra_, rb_ = nm.get_relaxed_roughness_weight_params(
                roughness * roughness, jnp.sqrt(dc["roughness_fraction"]))
            kw = dict(ra=ra_, rb=rb_, hit_dist=hit_dist,
                      bguide=nm.linearstep(0.03, 0.05, roughness))
        use_af = anti_firefly
        signal_out, sh_out, m1, m2, am1, am2 = history_fix_taps_pallas(
            sc, dc, config, signal=signal, sh=sh, view_z_in=view_z_in,
            normal_roughness=normal_roughness, data1=data1, fast_history=fast_history,
            stride=stride, ga=ga, gb=gb, normal_weight_param=normal_weight_param,
            ha=ha, hb=hb, frustum_size=frustum_size, frame_num=frame_num,
            material_id=material_id, hit_dist_scale=hit_dist_scale, n=n, nv=nv,
            is_diffuse=is_diffuse, anti_firefly=use_af, roughness=roughness,
            perf_mode=perf_mode, **kw)
        use_fix = (stride != 0.0)
        signal_out = jnp.where(use_fix[..., None], signal_out, signal)
        sh_out = jnp.where(use_fix[..., None], sh_out, sh) if sh is not None else None

        occ_like = occlusion or directional
        center = fast_history
        f = nm.saturate(frame_num / (dc["history_fix_frame_num"] + NRD_EPS))
        if not is_diffuse:
            f = nm.lerp(1.0, f, nm.get_spec_magic_curve(roughness))
        fast_out = nm.lerp(C.get_luma(signal_out, occ_like), center, f)
        sigma = nm.get_std_dev(m1, m2) * C.color_clamping_sigma_scale(occ_like)
        luma = C.get_luma(signal_out, occ_like)
        if use_af:
            asig = nm.get_std_dev(am1, am2) * C.REBLUR_ANTI_FIREFLY_SIGMA_SCALE
            luma = jnp.clip(luma, am1 - asig, am1 + asig)
        luma_clamped = jnp.clip(luma, m1 - sigma, m1 + sigma)
        fast_enabled = (dc["max_fast_accumulated_frame_num"]
                        < dc["max_accumulated_frame_num"]).astype(jnp.float32)
        luma = nm.lerp(luma_clamped, luma, 1.0 / (1.0 + fast_enabled * frame_num * 2.0))
        signal_out = C.change_luma(signal_out, luma, occlusion, directional)
        if sh_out is not None:
            scale = C.get_luma_scale(nm.length(sh_out[..., :3]), luma)
            sh_out = jnp.concatenate([sh_out[..., :3] * scale[..., None],
                                      sh_out[..., 3:]], -1)
        return signal_out, fast_out, sh_out

    sum_ = 1.0 + frame_num
    acc = signal * sum_[..., None]
    acc_sh = sh * sum_[..., None] if sh is not None else None

    # the reconstruction taps are at DYNAMIC stride -> gather at computed positions
    pos_grid = resample.pixel_pos_grid(h, w).astype(jnp.float32)
    rect_size_inv = sc["rect_size_inv"][None, None, :]
    min_material = dc["diff_min_material"] if is_diffuse else dc["spec_min_material"]

    for j in range(-2, 3):
        for i in range(-2, 3):
            if i == 0 and j == 0:
                continue
            if abs(i) + abs(j) == 4:
                continue
            uv_s = uv + jnp.asarray([i, j], jnp.float32) * stride[..., None] * rect_size_inv
            pos = pos_grid + jnp.asarray([i, j], jnp.float32) * stride[..., None]
            px = jnp.clip(pos[..., 0], 0, w - 1).astype(jnp.int32)
            py = jnp.clip(pos[..., 1], 0, h - 1).astype(jnp.int32)

            zs = unpack_view_z(sc, resample.texel_fetch(view_z_in, px, py))
            ns_packed = resample.texel_fetch(normal_roughness, px, py)
            ns, rs, ms = unpack_nr(sc, ns_packed, config)

            angle = nm.acos_approx(nm.dot(ns, n))
            xvs = nm.reconstruct_view_position(uv_s, sc["frustum"][None, None, :], zs,
                                               sc["ortho_mode"])
            w_ = resample.is_in_screen_nearest(uv_s)
            w_ = w_ * nm.compute_weight(nm.dot(nv, xvs), ga, gb)
            if config.normal_encoding.name == "R10_G10_B10_A2_UNORM":
                w_ = w_ * (jnp.maximum(material_id, min_material)
                           == jnp.maximum(ms, min_material)).astype(jnp.float32)
            w_ = w_ * nm.compute_exponential_weight(angle, normal_weight_param, 0.0)
            if not is_diffuse:
                w_ = w_ * nm.compute_exponential_weight(rs * rs, ra, rb)
            d1 = resample.texel_fetch(data1_diff if is_diffuse else data1_spec, px, py)
            w_ = w_ * (1.0 + d1)

            s = resample.texel_fetch(signal, px, py)
            s = jnp.where((w_ == 0.0)[..., None], 0.0, s)
            hs = C.extract_hit_dist(s) * hit_dist_scale
            hs_factor = nm.get_hit_dist_factor(hs, frustum_size)
            w_ = w_ * nm.compute_exponential_weight(hs_factor, ha, hb)

            if not is_diffuse:
                # low-roughness hitT guide (lines 349-352)
                d = jnp.abs(hit_dist - hs) / (jnp.maximum(hit_dist, hs) + 0.001)
                b = nm.linearstep(0.03, 0.05, roughness)
                w_ = w_ * nm.smoothstep(0.2 + b, 0.05 + b, d)

            sum_ = sum_ + w_
            acc = acc + s * w_[..., None]
            if acc_sh is not None:
                sh_s = resample.texel_fetch(sh, px, py)
                sh_s = jnp.where((w_ == 0.0)[..., None], 0.0, sh_s)
                acc_sh = acc_sh + sh_s * w_[..., None]

    inv = 1.0 / jnp.maximum(sum_, 1e-15)
    reconstructed = acc * inv[..., None]
    if acc_sh is not None:
        acc_sh = acc_sh * inv[..., None]
    use_fix = (stride != 0.0)
    signal_out = jnp.where(use_fix[..., None], reconstructed, signal)
    sh_out = jnp.where(use_fix[..., None], acc_sh, sh) if sh is not None else None

    # local variance over 3x3 fast history + fast history adjustments (lines 169-244)
    occ_like = occlusion or directional
    center = fast_history
    f = nm.saturate(frame_num / (dc["history_fix_frame_num"] + NRD_EPS))
    if not is_diffuse:
        f = nm.lerp(1.0, f, nm.get_spec_magic_curve(roughness))
    fast_out = nm.lerp(C.get_luma(signal_out, occ_like), center, f)

    m1 = jnp.zeros_like(center)
    m2 = jnp.zeros_like(center)
    for dy, dx in stencil.offsets_square(1):
        t = stencil.shifted(fast_history, dy, dx)
        m1 = m1 + t
        m2 = m2 + t * t
    m1 = m1 / 9.0
    m2 = m2 / 9.0
    sigma = nm.get_std_dev(m1, m2) * C.color_clamping_sigma_scale(occ_like)

    luma = C.get_luma(signal_out, occ_like)

    if anti_firefly:
        r = C.REBLUR_ANTI_FIREFLY_FILTER_RADIUS
        am1 = jnp.zeros_like(center)
        am2 = jnp.zeros_like(center)
        cnt = 0
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                if abs(dy) <= 1 and abs(dx) <= 1:
                    continue
                t = stencil.shifted(fast_history, dy, dx)
                am1 = am1 + t
                am2 = am2 + t * t
                cnt += 1
        am1 = am1 / cnt
        am2 = am2 / cnt
        asig = nm.get_std_dev(am1, am2) * C.REBLUR_ANTI_FIREFLY_SIGMA_SCALE
        luma = jnp.clip(luma, am1 - asig, am1 + asig)

    luma_clamped = jnp.clip(luma, m1 - sigma, m1 + sigma)
    fast_enabled = (dc["max_fast_accumulated_frame_num"]
                    < dc["max_accumulated_frame_num"]).astype(jnp.float32)
    luma = nm.lerp(luma_clamped, luma, 1.0 / (1.0 + fast_enabled * frame_num * 2.0))

    signal_out = C.change_luma(signal_out, luma, occlusion, directional)
    if sh_out is not None:
        scale = C.get_luma_scale(nm.length(sh_out[..., :3]), luma)
        sh_out = jnp.concatenate([sh_out[..., :3] * scale[..., None], sh_out[..., 3:]], -1)
    return signal_out, fast_out, sh_out


# ---------------------------------------------------------------------------
# Spatial blur (REBLUR_Blur.hlsli + REBLUR_Common_DiffuseSpatialFilter.hlsli)
# ---------------------------------------------------------------------------

BLUR = 1
POST_BLUR = 2


def cb_neighbor_resolve(sc, signal, view_z, frustum_size, nov):
    """Checkerboard wc-weighted horizontal-neighbor resolve (REBLUR_PrePass.hlsli:45-57,
    REBLUR_TemporalAccumulation.hlsli:309-320). signal: full-res-expanded (h, w, c)."""
    h, w = view_z.shape
    thr = nm.get_disocclusion_threshold(C.NRD_DISOCCLUSION_THRESHOLD, frustum_size, nov)
    z0 = stencil.shifted(view_z, 0, -1)
    z1 = stencil.shifted(view_z, 0, 1)
    col = jnp.arange(w)[None, :]
    w0 = (jnp.abs(z0 - view_z) <= thr).astype(jnp.float32)
    w1 = (jnp.abs(z1 - view_z) <= thr).astype(jnp.float32)
    w0 = jnp.where((z0 > sc["denoising_range"]) | (col < 1), 0.0, w0)
    w1 = jnp.where((z1 > sc["denoising_range"]) | (col >= w - 1), 0.0, w1)
    wsum = w0 + w1
    inv = jnp.where(wsum == 0.0, 0.0, 1.0 / jnp.maximum(wsum, 1e-15))
    s0 = stencil.shifted(signal, 0, -1)
    s1 = stencil.shifted(signal, 0, 1)
    return s0 * (w0 * inv)[..., None] + s1 * (w1 * inv)[..., None]


@jax.named_scope("REBLUR/diffuse_spatial_filter")
def diffuse_spatial_filter(sc, dc, mode, signal, view_z_in, normal_roughness, data1,
                           config, sh=None, *, occlusion: bool, directional: bool = False,
                           pallas: bool = False, perf_mode: bool = False):
    """Adaptive-radius 8-tap Poisson blur (screen-space sampling path).

    mode: BLUR or POST_BLUR. Returns (signal_out[, sh_out]).
    pallas=True runs the tap loop in kernels/reblur_pallas.spatial_filter_taps_pallas.
    """
    h, w = view_z_in.shape
    uv = resample.pixel_uv_grid(h, w)
    view_z = unpack_view_z(sc, view_z_in)
    n3, roughness, material_id = unpack_nr3(sc, normal_roughness, config)
    w2v = jnp.asarray(sc["world_to_view"])
    nv3 = v3.rotate(w2v, n3)
    u_p, v_p = uv[..., 0], uv[..., 1]
    xv3 = v3.reconstruct_view_position(u_p, v_p, sc["frustum"], view_z,
                                       sc["ortho_mode"])
    vv3 = v3.where(sc["ortho_mode"] == 0.0, v3.normalize(-xv3),
                   v3.V3.full_like(view_z, 0.0, 0.0, -1.0))
    nov = jnp.abs(v3.dot(nv3, vv3))
    n = n3.arr()
    nv = nv3.arr()
    xv = xv3.arr()
    frustum_size = nm.get_frustum_size(sc["min_rect_dim_mul_unproject"], sc["ortho_mode"],
                                       view_z)
    rotator = sc["rotator"] if mode == BLUR else sc["rotator_post"]

    fraction_scale = C.REBLUR_BLUR_FRACTION_SCALE if mode == BLUR \
        else C.REBLUR_POST_BLUR_FRACTION_SCALE
    radius_scale = 1.0 if mode == BLUR else C.REBLUR_POST_BLUR_RADIUS_SCALE

    hit_dist_scale = fe.get_hit_distance_normalization(
        view_z, dc["hit_dist_params"][None, None, :], jnp.ones_like(roughness))
    hit_dist = C.extract_hit_dist(signal) * hit_dist_scale
    hit_dist_factor = nm.get_hit_dist_factor(hit_dist, frustum_size)

    boost = 1.0 - C.get_fade_based_on_accumulated_frames(dc, data1)
    boost = boost * (1.0 - jnp.power(nm.saturate(1.0 - nov), 5.0))
    nlas = 1.0 / (1.0 + C.REBLUR_SAMPLES_PER_FRAME * (1.0 - boost) * data1)

    blur_radius = dc["max_blur_radius"] * jnp.sqrt(nm.saturate(hit_dist_factor * nlas))
    blur_radius = blur_radius * radius_scale
    blur_radius = jnp.maximum(blur_radius, dc["min_blur_radius"])

    enc_err = nm.normal_encoding_error(int(config.normal_encoding))
    ga = 1.0 / (dc["plane_dist_sensitivity"] * frustum_size)
    gb = -v3.dot(nv3, xv3) * ga
    normal_weight_param = nm.get_normal_weight_param(
        nlas, dc["lobe_angle_fraction"], jnp.ones_like(roughness), enc_err) / fraction_scale
    ha, hb = nm.get_hit_distance_weight_params(C.extract_hit_dist(signal), nlas)
    min_hit_dist_weight = dc["min_hit_distance_weight"] * fraction_scale
    if not occlusion:
        min_hit_dist_weight = min_hit_dist_weight * jnp.sqrt(nlas)

    if pallas:
        from ...kernels import get_spatial_filter

        spatial_filter_taps_pallas = get_spatial_filter()

        mhdw = jnp.broadcast_to(jnp.asarray(min_hit_dist_weight, jnp.float32),
                                view_z.shape)
        return spatial_filter_taps_pallas(
            sc, dc, config, rotator=rotator, signal=signal, sh=sh,
            view_z_in=view_z_in, normal_roughness=normal_roughness,
            blur_radius=blur_radius, ga=ga, gb=gb,
            normal_weight_param=normal_weight_param, ha=ha, hb=hb,
            min_hit_dist_weight=mhdw, material_id=material_id, n=n, nv=nv,
            perf_mode=perf_mode)[:2]

    # screen-space sampling (REBLUR_USE_SCREEN_SPACE_SAMPLING_FOR_DIFFUSE == 1)
    skew = nm.lerp(1.0 - jnp.abs(nv[..., :2]), 1.0, nov[..., None])
    skew = skew / jnp.max(skew, -1, keepdims=True)
    skew = skew * sc["rect_size_inv"][None, None, :] * blur_radius[..., None]
    scaled_rotator = nm.scale_rotator(jnp.broadcast_to(rotator, uv.shape[:2] + (4,)), skew)

    rect = sc["rect_size"][None, None, :]
    sum_ = jnp.ones_like(view_z)
    acc = signal
    acc_sh = sh
    min_material = dc["diff_min_material"]

    for tap in (nm.SPECIAL_6 if perf_mode else nm.SPECIAL_8):
        offset = jnp.asarray(tap[:2])
        uv_s = uv + nm.rotate_vector2(scaled_rotator, jnp.broadcast_to(offset, uv.shape))
        uv_s = (jnp.floor(uv_s * rect) + 0.5) / rect  # snap to pixel center

        zs = unpack_view_z(sc, resample.sample_nearest(view_z_in, uv_s))
        ns, rs, ms = unpack_nr(sc, resample.sample_nearest(normal_roughness, uv_s), config)

        angle = nm.acos_approx(nm.dot(n, ns))
        xvs = nm.reconstruct_view_position(uv_s, sc["frustum"][None, None, :], zs,
                                           sc["ortho_mode"])
        w_ = resample.is_in_screen_nearest(uv_s)
        w_ = w_ * nm.compute_weight(nm.dot(nv, xvs), ga, gb)
        if config.normal_encoding.name == "R10_G10_B10_A2_UNORM":
            w_ = w_ * (jnp.maximum(material_id, min_material)
                       == jnp.maximum(ms, min_material)).astype(jnp.float32)
        w_ = w_ * nm.compute_weight(angle, normal_weight_param, 0.0)

        s = resample.sample_nearest(signal, uv_s)
        s = jnp.where((w_ == 0.0)[..., None], 0.0, s)
        w_ = w_ * nm.lerp(min_hit_dist_weight, 1.0,
                          nm.compute_exponential_weight(C.extract_hit_dist(s), ha, hb))
        w_ = w_ * nm.get_gaussian_weight(float(tap[2]))

        sum_ = sum_ + w_
        acc = acc + s * w_[..., None]
        if acc_sh is not None:
            sh_s = resample.sample_nearest(sh, uv_s)
            sh_s = jnp.where((w_ == 0.0)[..., None], 0.0, sh_s)
            acc_sh = acc_sh + sh_s * w_[..., None]

    inv = 1.0 / jnp.maximum(sum_, 1e-15)
    out = acc * inv[..., None]
    out_sh = acc_sh * inv[..., None] if acc_sh is not None else None
    return out, out_sh


# ---------------------------------------------------------------------------
# SplitScreen (REBLUR_SplitScreen.hlsli)
# ---------------------------------------------------------------------------


@jax.named_scope("REBLUR/split_screen")
def split_screen(sc, noisy_input, view_z_in, out_signal):
    h, w = view_z_in.shape
    view_z = unpack_view_z(sc, view_z_in)
    u = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    noisy = noisy_input * (view_z < sc["denoising_range"]).astype(jnp.float32)[..., None]
    show_input = (u[None, :, None] <= sc["split_screen"])
    return jnp.where(show_input, noisy, out_signal)


# ---------------------------------------------------------------------------
# TemporalAccumulation - specular half (REBLUR_TemporalAccumulation.hlsli:323-814)
# ---------------------------------------------------------------------------


def _stochastic_bilinear_uv(sc, uv, tex_size, pixel_pos, config, state=None):
    """StochasticBilinear (Common.hlsli:359-372): stochastically-rounded nearest uv.

    The reference initializes Rng ONCE per shader (Rng::Hash::Initialize at the TA
    prelude, :117) and every StochasticBilinear call consumes the NEXT two draws of
    that stream - so callers with several stochastic fetches must thread `state`
    through them (pass the result of nm.hash_init and use the returned state for
    the next call). state=None keeps the legacy one-shot behavior for single-fetch
    callers. Returns (uv_s, new_state)."""
    if config.normal_encoding.name != "R10_G10_B10_A2_UNORM":
        return uv, state  # linear filter path uses plain bilinear of the packed data
    if state is None:
        state = nm.hash_init((pixel_pos[..., 0], pixel_pos[..., 1]),
                             sc["frame_index"])
    state, rnd = nm.hash_float2(state)
    origin, f = nm.bilinear_filter(uv, tex_size)
    origin = origin + (rnd < f).astype(jnp.float32)
    return (origin + 0.5) / tex_size, state


def _sample_normal_roughness_stochastic(sc, prev_normal_roughness, uv, pixel_pos,
                                        config, state=None):
    """Returns (n, roughness, material, new_state) - see _stochastic_bilinear_uv."""
    h, w = prev_normal_roughness.shape[:2]
    size = jnp.asarray([w, h], jnp.float32)
    if config.normal_encoding.name == "R10_G10_B10_A2_UNORM":
        uv_s, state = _stochastic_bilinear_uv(sc, uv, size, pixel_pos, config, state)
        packed = resample.sample_nearest(prev_normal_roughness, uv_s)
    else:
        packed = resample.sample_bilinear(prev_normal_roughness, uv)
    return unpack_nr(sc, packed, config) + (state,)


def get_xvirtual(sc, hit_dist, curvature, x, x_prev, n, v, roughness):
    """GetXvirtual, NRD_USE_SPECULAR_MOTION_V2 == 1 (Common.hlsli:411-461)."""
    d4 = nm.get_specular_dominant_direction(n, v, roughness)
    d, dw = d4[..., :3], d4[..., 3]

    reflection_ray = d * hit_dist[..., None]
    t, b = nm.get_basis(n)
    o = nm.rotate_vector_by_basis(t, b, n, reflection_ray)
    oz = -o[..., 2]
    mag = 1.0 / (2.0 * curvature * oz - 1.0)

    f = nm.length(x)
    f = f * (1.0 - jnp.abs(nm.dot(n, v)))
    f = f * jnp.maximum(curvature, 0.0)
    mag = mag / (1.0 + f)

    iw_len = nm.length(o * mag[..., None])

    closeness = nm.saturate(iw_len / (hit_dist + NRD_EPS))
    origin = nm.lerp(x_prev, x, (closeness * dw)[..., None])
    return origin - v * (iw_len * dw)[..., None]


def get_xvirtual3(sc, hit_dist, curvature, x, x_prev, n, v, roughness):
    """get_xvirtual on plane-wise V3s (see vec3.py for why)."""
    d, dw = v3.get_specular_dominant_direction(n, v, roughness,
                                               nm.get_specular_dominant_factor)
    reflection_ray = d * hit_dist
    t, b = v3.get_basis(n)
    o = v3.V3(v3.dot(t, reflection_ray), v3.dot(b, reflection_ray),
              v3.dot(n, reflection_ray))
    oz = -o.z
    mag = 1.0 / (2.0 * curvature * oz - 1.0)
    f = v3.length(x)
    f = f * (1.0 - jnp.abs(v3.dot(n, v)))
    f = f * jnp.maximum(curvature, 0.0)
    mag = mag / (1.0 + f)
    iw_len = v3.length(o * mag)
    closeness = nm.saturate(iw_len / (hit_dist + NRD_EPS))
    origin = v3.lerp(x_prev, x, closeness * dw)
    return origin - v * (iw_len * dw)


@jax.named_scope("REBLUR/temporal_accumulation_specular")
def temporal_accumulation_specular(sc, dc, sm, spec_input, spec_history, spec_fast_history,
                                   view_z_in, normal_roughness,
                                   prev_view_z, prev_normal_roughness, prev_internal,
                                   hit_dist_for_tracking_in, prev_spec_hitdist_for_tracking,
                                   config, spec_confidence=None, *, occlusion: bool,
                                   has_prepass_hitdist: bool,
                                   spec_sh_input=None, spec_sh_history=None,
                                   perf_mode=False, has_data=True,
                                   samples=None, sampler=None):
    """Specular half of TA. Returns dict(spec, fast, accum_speed, fbits_vmb, curvature,
    virtual_history_amount, hit_dist_for_tracking[, sh]).

    samples: pre-resolved surface-motion history samples (dict(history, fast[, sh])) from
    the Pallas path; sampler: gather backend (kernels/reblur_pallas.PallasSampler) used for
    the stencil prelude, curvature taps, stochastic taps, and the virtual-motion footprint.
    Both None -> pure XLA gathers (reference path)."""
    h, w = sm["view_z"].shape
    uv = sm["uv"]
    view_z = sm["view_z"]
    n, roughness = sm["n"], sm["roughness"]
    x, x_prev, v = sm["x"], sm["x_prev"], sm["v"]
    nov = sm["nov"]
    pixel_pos = resample.pixel_pos_grid(h, w)
    rect = sc["rect_size"][None, None, :]
    rect_prev = sc["rect_size_prev"][None, None, :]
    enc_err = nm.normal_encoding_error(int(config.normal_encoding))

    # 3x3 min hitDist for tracking + roughness variance (lines 62-111)
    hdt_src = jnp.where(hit_dist_for_tracking_in == 0.0, NRD_INF, hit_dist_for_tracking_in)
    if sampler is not None:
        hit_dist_for_tracking, rough_m1, rough_m2 = sampler.spec_prelude(hdt_src,
                                                                         roughness)
    else:
        hit_dist_for_tracking = hdt_src
        rough_m1 = jnp.zeros_like(view_z)
        rough_m2 = jnp.zeros_like(view_z)
        for dy, dx in stencil.offsets_square(1):
            hit_dist_for_tracking = jnp.minimum(hit_dist_for_tracking,
                                                stencil.shifted(hdt_src, dy, dx))
            _, rs, _ = unpack_nr(sc, stencil.shifted(normal_roughness, dy, dx), config)
            rsq = rs * rs
            rough_m1 = rough_m1 + rsq
            rough_m2 = rough_m2 + rsq * rsq
        rough_m1 = rough_m1 / 9.0
        rough_m2 = rough_m2 / 9.0
    roughness_sigma = nm.get_std_dev(rough_m1, rough_m2)
    roughness_modified = C.get_modified_roughness_from_normal_variance(roughness, sm["n_avg"])

    hit_dist_normalization = fe.get_hit_distance_normalization(
        view_z, dc["hit_dist_params"][None, None, :], roughness)
    hit_dist_for_tracking = jnp.where(hit_dist_for_tracking == NRD_INF, 0.0,
                                      hit_dist_for_tracking)
    if not has_prepass_hitdist:
        hit_dist_for_tracking = hit_dist_for_tracking * hit_dist_normalization
    hdt_out = hit_dist_for_tracking

    # accumulation speed (lines 325-331)
    spec_history_confidence = sm["footprint_quality"]
    if spec_confidence is not None:
        spec_history_confidence = spec_history_confidence * spec_confidence
    smb_spec_accum_speed = sm["spec_accum_speed"]
    smb_spec_accum_speed = smb_spec_accum_speed * nm.lerp(
        spec_history_confidence, 1.0, 1.0 / (1.0 + smb_spec_accum_speed))
    smb_spec_accum_speed = jnp.minimum(smb_spec_accum_speed, dc["max_accumulated_frame_num"])

    spec = spec_input

    # ---- curvature estimation along predicted motion (lines 356-447) ----
    # plane-wise V3 math throughout the glue: (H, W, 3) intermediates run at ~3/128
    # lane utilization on TPU (see vec3.py) - this section was ~80% of the TA cost
    x3 = v3.V3.of(x)
    xp3 = v3.V3.of(x_prev)
    n3 = v3.V3.of(n)
    vv3 = v3.V3.of(v)
    u_p, v_p = uv[..., 0], uv[..., 1]
    smb_u = sm["smb_pixel_uv"][..., 0]
    smb_v = sm["smb_pixel_uv"][..., 1]
    rw_, rh_ = sc["rect_size"][0], sc["rect_size"][1]
    riw_, rih_ = sc["rect_size_inv"][0], sc["rect_size_inv"][1]
    is_persp = sc["ortho_mode"] == 0.0
    cd = sc["camera_delta"]
    cd3 = v3.V3(cd[0], cd[1], cd[2])

    uvzp_u = jnp.where(is_persp, smb_u, u_p)
    uvzp_v = jnp.where(is_persp, smb_v, v_p)
    p1u, p1v = v3.get_screen_uv(jnp.asarray(sc["world_to_clip_prev"]), xp3 + cd3)
    dux = (uvzp_u - p1u) * rw_
    duy = (uvzp_v - p1v) * rh_
    parallax1 = jnp.sqrt(dux * dux + duy * duy)
    inv_par = 1.0 / jnp.maximum(parallax1, 1.0 / 256.0)
    dux = dux * inv_par
    duy = duy * inv_par

    v2w = jnp.asarray(sc["view_to_world"])

    def edge_point(du_, dv_):
        xe = v3.reconstruct_view_position(u_p + du_ * riw_, v_p + dv_ * rih_,
                                          sc["frustum"], jnp.ones_like(view_z),
                                          sc["ortho_mode"])
        xw = v3.rotate(v2w, xe)
        vvw = sc["view_vector_world"]
        vw = v3.where(is_persp, v3.normalize(-xw),
                      v3.V3.full_like(view_z, vvw[0], vvw[1], vvw[2]))
        o = v3.where(is_persp, v3.V3.full_like(view_z, 0.0, 0.0, 0.0), xw)
        ndv = v3.dot(n3, vw)
        t = v3.dot(x3 - o, n3) / jnp.where(jnp.abs(ndv) < 1e-9, 1e-9, ndv)
        return o + vw * t

    x10 = edge_point(1.0, 0.0)
    x01 = edge_point(0.0, 1.0)
    if sampler is not None:
        shifted_nr = sampler.shift([normal_roughness[..., 0], normal_roughness[..., 1]],
                                   [(0, 1), (1, 0)])
        n10 = v3.decode_oct(shifted_nr[0][0], shifted_nr[1][0])
        n01 = v3.decode_oct(shifted_nr[0][1], shifted_nr[1][1])
    else:
        nr01 = stencil.shifted(normal_roughness, 0, 1)
        nr10 = stencil.shifted(normal_roughness, 1, 0)
        n10 = v3.decode_oct_raw(nr01[..., 0], nr01[..., 1])
        n01 = v3.decode_oct_raw(nr10[..., 0], nr10[..., 1])

    wmx = jnp.abs(dux) + 1.0 / 256.0
    wmy = jnp.abs(duy) + 1.0 / 256.0
    wnorm = 1.0 / (wmx + wmy)
    wmx = wmx * wnorm
    wmy = wmy * wnorm
    x_edge = x10 * wmx + x01 * wmy
    n_edge = v3.normalize(n10 * wmx + n01 * wmy)

    # high-parallax flattening (lines 404-429)
    bayer = nm.bayer4x4((pixel_pos[..., 0], pixel_pos[..., 1]), sc["frame_index"])
    delta_uv_len_fixed = sm["parallax_min"] * (1.0 + sc["framerate_scale"] * bayer)
    mu = u_p + delta_uv_len_fixed * dux * riw_
    mv_ = v_p + delta_uv_len_fixed * duy * rih_
    mu = (jnp.floor(mu * rw_) + 0.5) * riw_
    mv_ = (jnp.floor(mv_ * rh_) + 0.5) * rih_
    in_screen_high = ((mu > 0.0) & (mu < 1.0) & (mv_ > 0.0)
                      & (mv_ < 1.0)).astype(jnp.float32)
    if sampler is not None:
        motion_uv_high = jnp.stack([mu, mv_], -1)
        (zh_raw, nh0, nh1), high_valid = sampler.nearest(
            [view_z_in, normal_roughness[..., 0], normal_roughness[..., 1]],
            motion_uv_high, rect_cur=True)
        z_high = unpack_view_z(sc, zh_raw)
        n_high = v3.decode_oct(nh0, nh1)
        in_screen_high = in_screen_high * high_valid
    else:
        motion_uv_high = jnp.stack([mu, mv_], -1)
        z_high = unpack_view_z(sc, resample.sample_nearest(view_z_in, motion_uv_high))
        nr_high = resample.sample_nearest(normal_roughness, motion_uv_high)
        n_high = v3.decode_oct_raw(nr_high[..., 0], nr_high[..., 1])
    x_high = v3.rotate(v2w, v3.reconstruct_view_position(mu, mv_, sc["frustum"],
                                                         z_high, sc["ortho_mode"]))
    z_error = jnp.abs(z_high - view_z) / jnp.maximum(jnp.maximum(z_high, view_z), 1e-15)
    replace = jnp.logical_and(z_error < C.NRD_CURVATURE_Z_THRESHOLD,
                              jnp.logical_and(delta_uv_len_fixed > 1.0,
                                              in_screen_high > 0.0))
    x_edge = v3.where(replace, x_high, x_edge)
    n_edge = v3.where(replace, n_high, n_edge)

    edge = x_edge - x3
    edge_len_sq = v3.dot(edge, edge)
    curvature = v3.dot(n_edge - n3, edge) / jnp.maximum(edge_len_sq, 1e-15)
    curvature = jnp.where(edge_len_sq < 1e-15, 0.0, curvature)

    # ---- virtual motion coordinates (lines 449-457) ----
    x_virtual3 = get_xvirtual3(sc, hit_dist_for_tracking, curvature, x3, xp3, n3, vv3,
                               roughness)
    x_virtual_length = v3.length(x_virtual3)
    vmb_u, vmb_v = v3.get_screen_uv(jnp.asarray(sc["world_to_clip_prev"]), x_virtual3)
    is_camera_attached = (sm["material_id"]
                          == sc["camera_attached_reflection_material_id"])
    vmb_u = jnp.where(is_camera_attached, smb_u, vmb_u)
    vmb_v = jnp.where(is_camera_attached, smb_v, vmb_v)
    vmb_pixel_uv = jnp.stack([vmb_u, vmb_v], -1)

    vdx = (vmb_u - smb_u) * rw_
    vdy = (vmb_v - smb_v) * rh_
    vmb_pixels_traveled = jnp.sqrt(vdx * vdx + vdy * vdy)

    # ---- roughness confidence (lines 459-470) ----
    vmb_origin, vmb_frac = nm.bilinear_filter(vmb_pixel_uv, rect_prev)
    ra, rb = nm.get_relaxed_roughness_weight_params(
        roughness * roughness, dc["roughness_fraction"], C.REBLUR_ROUGHNESS_SENSITIVITY_IN_TA)
    vmb_bundle = None
    if sampler is None:
        nr_taps_vmb = gather_2x2_at(prev_normal_roughness, vmb_origin)
        rough_weights = []
        for tap in nr_taps_vmb:
            _, r_t, _ = unpack_nr(sc, tap, config)
            w_ = nm.compute_non_exponential_weight_with_sigma(r_t * r_t, ra, rb,
                                                              roughness_sigma)
            w_ = nm.lerp(nm.smoothstep(1.0, 0.0, sm["parallax_max"]), 1.0, w_)
            rough_weights.append(w_)
        rough_weights4 = jnp.stack(rough_weights, -1)
        bwv = nm.bilinear_weights(vmb_frac)
        virtual_roughness_confidence = jnp.sum(rough_weights4 * bwv, -1)

    # ---- virtual normal confidence: parallax (lines 472-479) ----
    # prev-prev tap positions (lines 579-585) are pure functions of the smb/vmb uvs,
    # so their stochastic-nearest fetches batch with the vmb normal fetch into ONE
    # Pallas launch (sampler.nearest_multi; weights still applied below in order)
    step_between_taps = jnp.minimum(vmb_pixels_traveled * sc["framerate_scale"], 2.0) \
        + vmb_pixels_traveled / C.REBLUR_VIRTUAL_MOTION_PREV_PREV_WEIGHT_ITERATION_NUM
    duv_u = vmb_u - smb_u
    duv_v = vmb_v - smb_v
    inv_vd = jax_rsqrt(duv_u * duv_u + duv_v * duv_v)  # normalize in UV space
    vmb_dir_u = duv_u * inv_vd / sc["rect_size_prev"][0]
    vmb_dir_v = duv_v * inv_vd / sc["rect_size_prev"][1]
    pp_uvs, pp_inscreen = [], []
    for it in range(1, C.REBLUR_VIRTUAL_MOTION_PREV_PREV_WEIGHT_ITERATION_NUM + 1):
        ppu = vmb_u + vmb_dir_u * (it * step_between_taps)
        ppv = vmb_v + vmb_dir_v * (it * step_between_taps)
        pp_uvs.append(jnp.stack([ppu, ppv], -1))
        pp_inscreen.append(((ppu > 0.0) & (ppu < 1.0) & (ppv > 0.0)
                            & (ppv < 1.0)).astype(jnp.float32))
    pp_samples = None
    # one Rng stream per pixel, drawn in the reference's order: vmbN fetch first,
    # then the prev-prev taps (Rng::Hash::Initialize at :117; draws at :473, :598)
    rng_state = nm.hash_init((pixel_pos[..., 0], pixel_pos[..., 1]),
                             sc["frame_index"])
    if sampler is not None:
        uv_s, rng_state = _stochastic_bilinear_uv(
            sc, vmb_pixel_uv, sc["rect_size_prev"], pixel_pos, config, rng_state)
        pp_uv_s = []
        for u_ in pp_uvs:
            u_s, rng_state = _stochastic_bilinear_uv(
                sc, u_, sc["rect_size_prev"], pixel_pos, config, rng_state)
            pp_uv_s.append(u_s)
        multi = sampler.nearest_multi(
            [prev_normal_roughness[..., 0], prev_normal_roughness[..., 1],
             prev_normal_roughness[..., 2]], [uv_s] + pp_uv_s)
        (vn0, vn1, vr_raw), _vmb_n_valid = multi[0]
        pp_samples = multi[1:]
        vmb_n3 = v3.decode_oct(vn0, vn1)
        if config.roughness_encoding.name == "SQRT_LINEAR":
            vmb_roughness = vr_raw * vr_raw
        elif config.roughness_encoding.name == "SQ_LINEAR":
            vmb_roughness = jnp.sqrt(nm.saturate(vr_raw))
        else:
            vmb_roughness = vr_raw
    else:
        vmb_n_, vmb_roughness, _, rng_state = _sample_normal_roughness_stochastic(
            sc, prev_normal_roughness, vmb_pixel_uv, pixel_pos, config, rng_state)
        vmb_n3 = v3.V3.of(vmb_n_)
    vmb_n3 = v3.rotate(jnp.asarray(sc["world_prev_to_world"]), vmb_n3)
    dfactor = nm.get_specular_dominant_factor(nov, roughness)
    nd3 = n3 - vmb_n3
    virtual_normal_confidence = 1.0 / (
        1.0 + 0.5 * dfactor * nm.saturate(v3.length(nd3) - enc_err)
        * vmb_pixels_traveled)
    smb_navg3 = v3.where(sm["footprint_quality"] == 0.0, vmb_n3,
                         v3.V3.of(sm["smb_navg"]))

    # ---- virtual motion disocclusion (lines 481-519) ----
    # the reference reuses the TA's local `disocclusionThreshold` (:224-226), which
    # includes the threshold-mix lerp AND the +0.05 * smallParallax bump - NOT the
    # raw setting (round-4 parity fix; the oracle pinned this)
    vmb_thr = sm["dis_thr"] * sm["frustum_size"]
    vmb_thr = vmb_thr * nm.lerp(0.25, 1.0, nov)
    vmb_thr = vmb_thr * (v3.dot(vmb_n3, n3)
                         > C.REBLUR_ALMOST_ZERO_ANGLE).astype(jnp.float32)
    vmb_thr = vmb_thr * (v3.dot(vmb_n3, smb_navg3)
                         > C.REBLUR_ALMOST_ZERO_ANGLE).astype(jnp.float32)

    w2v_prev = jnp.asarray(sc["world_to_view_prev"])
    vmb_vv3 = v3.reconstruct_view_position(vmb_u, vmb_v, sc["frustum_prev"],
                                           jnp.ones_like(view_z), 0.0)
    vmb_v3_ = v3.rotate_inv(w2v_prev, vmb_vv3)  # RotateVectorInverse
    nox_curr = v3.dot(n3, xp3 - cd3)

    if sampler is not None:
        vmb_mvy, vmb_mvx = uv_to_mv_pix(vmb_pixel_uv, h, w, sc["rect_size_prev"])
        vmb_bundle = sampler.vmb_bundle(
            sc, dc, config, mv_pix_y=vmb_mvy, mv_pix_x=vmb_mvx, nox_curr=nox_curr,
            vmb_thr=vmb_thr, n=n, vmb_v=vmb_v3_.arr(), ra=ra, rb=rb,
            roughness_sigma=roughness_sigma,
            parallax_sm=nm.smoothstep(1.0, 0.0, sm["parallax_max"]),
            material_id_center=sm["material_id"],
            smb_allow_catrom=sm["allow_catrom"].astype(jnp.float32),
            prev_view_z=prev_view_z, prev_nr_packed=prev_normal_roughness,
            prev_mat=prev_internal["material_id"],
            spec_accum=prev_internal["spec_accum"], spec_hist4=spec_history,
            spec_fast=spec_fast_history, prev_hdt=prev_spec_hitdist_for_tracking,
            sh_hist4=spec_sh_history if spec_sh_input is not None else None,
            use_catrom=not perf_mode)
        virtual_roughness_confidence = vmb_bundle["rough_conf"]
        fbits_vmb = vmb_bundle["fbits_vmb"]
        vmb_footprint_quality = jnp.sqrt(nm.saturate(vmb_bundle["footprint_raw"]))
        vmb_spec_accum_speed = vmb_bundle["spec_accum_speed_raw"]
        vmb_spec_accum_speed = vmb_spec_accum_speed * nm.lerp(
            vmb_footprint_quality, 1.0, 1.0 / (1.0 + vmb_spec_accum_speed))
        vmb_allow_catrom = vmb_bundle["allow_catrom"] > 0.5
        vmb_occlusion_weights = None
    else:
        in_screen_vmb = resample.is_in_screen_bilinear(vmb_origin, sc["rect_size_prev"])
        z_taps_vmb = gather_2x2_at(prev_view_z, vmb_origin)
        vmb_occ = []
        for tap_idx, z_t in enumerate(z_taps_vmb):
            z_t = unpack_view_z(sc, z_t)
            zscale = jnp.where(sc["ortho_mode"] == 0.0, z_t, sc["ortho_mode"])
            nox_prev = (n3.x * vmb_v3_.x + n3.y * vmb_v3_.y) * zscale \
                + n3.z * vmb_v3_.z * z_t
            plane_dist = jnp.abs(nox_prev - nox_curr)
            thr = vmb_thr * in_screen_vmb[..., tap_idx] - NRD_EPS
            o = (plane_dist <= thr).astype(jnp.float32)
            o = o * (rough_weights4[..., tap_idx] >= 0.5).astype(jnp.float32)
            vmb_occ.append(o)

        mat_taps_vmb = gather_2x2_at(prev_internal["material_id"], vmb_origin)
        spec_taps_vmb = gather_2x2_at(prev_internal["spec_accum"], vmb_origin)
        if config.normal_encoding.name == "R10_G10_B10_A2_UNORM":
            for i in range(4):
                same = (jnp.maximum(sm["material_id"], dc["spec_min_material"])
                        == jnp.maximum(mat_taps_vmb[i],
                                       dc["spec_min_material"])).astype(jnp.float32)
                vmb_occ[i] = vmb_occ[i] * same
        vmb_occ4 = jnp.stack(vmb_occ, -1)

        fbits_vmb = (vmb_occ4[..., 0] * 16.0 + vmb_occ4[..., 1] * 32.0
                     + vmb_occ4[..., 2] * 64.0 + vmb_occ4[..., 3] * 128.0)

        vmb_occlusion_weights = nm.get_bilinear_custom_weights(vmb_frac, vmb_occ4)
        vmb_spec_accum_speed = nm.apply_bilinear_custom_weights(
            spec_taps_vmb[0][..., None], spec_taps_vmb[1][..., None],
            spec_taps_vmb[2][..., None], spec_taps_vmb[3][..., None],
            vmb_occlusion_weights)[..., 0]
        vmb_footprint_quality = jnp.sqrt(nm.saturate(jnp.sum(vmb_occ4 * bwv, -1)))
        vmb_spec_accum_speed = vmb_spec_accum_speed * nm.lerp(
            vmb_footprint_quality, 1.0, 1.0 / (1.0 + vmb_spec_accum_speed))

        vmb_allow_catrom = jnp.logical_and(jnp.sum(vmb_occ4, -1) > 3.5,
                                           sm["allow_catrom"])

    # ---- curvature / lobe angles (lines 532-554) ----
    curvature_angle_tan = sm["pixel_size"] * jnp.abs(curvature)
    curvature_angle_tan = curvature_angle_tan * jnp.maximum(
        vmb_pixels_traveled / jnp.maximum(nov, 0.01), 1.0)
    curvature_angle_tan = curvature_angle_tan * 2.0
    curvature_angle = jnp.arctan(curvature_angle_tan)

    percent_of_volume = nm.NRD_MAX_PERCENT_OF_LOBE_VOLUME / (1.0 + vmb_spec_accum_speed)
    lobe_tan_half = nm.get_specular_lobe_tan_half_angle(roughness_modified,
                                                        percent_of_volume)
    lobe_half_angle = jnp.maximum(jnp.arctan(lobe_tan_half), enc_err)

    angle_nw = nm.acos_approx(v3.dot(n3, vmb_n3))
    normal_weight = nm.smoothstep01(
        1.0 - (angle_nw - curvature_angle - enc_err) / lobe_half_angle)
    normal_weight = nm.lerp(nm.smoothstep(1.0, 0.0, vmb_pixels_traveled), 1.0,
                            normal_weight)
    virtual_normal_confidence = jnp.minimum(virtual_normal_confidence, normal_weight)

    virtual_history_amount = nm.smoothstep(0.05, 0.95, dfactor)
    virtual_history_amount = virtual_history_amount * virtual_normal_confidence

    # ---- parallax confidence (lines 561-577) ----
    if sampler is not None:
        hdt_prev = vmb_bundle["hdt_prev"]
    else:
        hdt_prev = resample.sample_bilinear(prev_spec_hitdist_for_tracking,
                                            vmb_pixel_uv * sc["resolution_scale_prev"]
                                            [None, None, :])
    x_virtual_prev3 = get_xvirtual3(sc, hdt_prev, curvature, x3, xp3, n3, vv3,
                                    roughness)
    vpu, vpv = v3.get_screen_uv(jnp.asarray(sc["world_to_clip_prev"]), x_virtual_prev3)
    vpu = jnp.where(is_camera_attached, smb_u, vpu)
    vpv = jnp.where(is_camera_attached, smb_v, vpv)
    pixel_size_at_xvirtual = nm.pixel_radius_to_world(sc["unproject"], sc["ortho_mode"],
                                                      1.0, x_virtual_length)
    r_conf = (lobe_tan_half + curvature_angle) * jnp.minimum(
        hit_dist_for_tracking, hdt_prev) / jnp.maximum(pixel_size_at_xvirtual, 1e-15)
    dcx = (vpu - vmb_u) * rw_
    dcy = (vpv - vmb_v) * rh_
    d_conf = jnp.sqrt(dcx * dcx + dcy * dcy)
    r_conf = jnp.maximum(r_conf, 0.1)
    virtual_parallax_confidence = nm.linearstep(r_conf, 0.0, d_conf)

    # ---- prev-prev taps (lines 579-608; positions + fetches hoisted above) ----
    ra2, rb2 = nm.get_relaxed_roughness_weight_params(
        vmb_roughness * vmb_roughness, dc["roughness_fraction"],
        C.REBLUR_ROUGHNESS_SENSITIVITY_IN_TA)
    for it in range(1, C.REBLUR_VIRTUAL_MOTION_PREV_PREV_WEIGHT_ITERATION_NUM + 1):
        uv_pp = pp_uvs[it - 1]
        in_screen = pp_inscreen[it - 1]
        if sampler is not None:
            (p0, p1, pr_raw), pp_valid = pp_samples[it - 1]
            n_pp3 = v3.decode_oct(p0, p1)
            if config.roughness_encoding.name == "SQRT_LINEAR":
                r_pp = pr_raw * pr_raw
            elif config.roughness_encoding.name == "SQ_LINEAR":
                r_pp = jnp.sqrt(nm.saturate(pr_raw))
            else:
                r_pp = pr_raw
            in_screen = in_screen * pp_valid
        else:
            n_pp_, r_pp, _, rng_state = _sample_normal_roughness_stochastic(
                sc, prev_normal_roughness, uv_pp, pixel_pos, config, rng_state)
            n_pp3 = v3.V3.of(n_pp_)
        angle_pp = nm.acos_approx(v3.dot(vmb_n3, n_pp3))
        wx = nm.smoothstep01(
            1.0 - (angle_pp - curvature_angle * (1.0 + it * step_between_taps)
                   - enc_err) / lobe_half_angle)
        wy = nm.compute_non_exponential_weight_with_sigma(r_pp * r_pp, ra2, rb2,
                                                          roughness_sigma)
        if config.normal_encoding.name == "R10_G10_B10_A2_UNORM":
            wx = nm.lerp(1.0, wx, nm.saturate(step_between_taps))
            wy = nm.lerp(1.0, wy, nm.saturate(step_between_taps))
        wx = jnp.where(in_screen > 0.0, wx, 1.0)
        wy = jnp.where(in_screen > 0.0, wy, 1.0)
        virtual_normal_confidence = jnp.minimum(virtual_normal_confidence, wx)
        virtual_roughness_confidence = jnp.minimum(virtual_roughness_confidence, wy)

    virtual_confidence_for_smb = virtual_normal_confidence * virtual_roughness_confidence
    virtual_confidence = virtual_confidence_for_smb * virtual_parallax_confidence
    virtual_history_amount = virtual_history_amount * virtual_roughness_confidence

    # ---- surface history + confidences (lines 617-654) ----
    if samples is not None:
        smb_spec_history = samples["history"]
        smb_spec_fast = samples["fast"]
    else:
        smb_spec_history = sample_history(spec_history, sm["smb_pixel_uv"],
                                          sc["rect_size_prev"], sm["occlusion_weights"],
                                          sm["allow_catrom"])
        smb_spec_fast = sample_history_bilinear(spec_fast_history, sm["smb_pixel_uv"],
                                                sc["rect_size_prev"],
                                                sm["occlusion_weights"])

    a_par = jnp.arctan(sm["parallax_max"] * sm["pixel_size"]
                       / jnp.maximum(v3.length(x3), 1e-9))
    nlas_smb = 1.0 / (1.0 + smb_spec_accum_speed)
    h_conf = nm.lerp(C.extract_hit_dist(smb_spec_history), C.extract_hit_dist(spec),
                     nlas_smb) * hit_dist_normalization
    tana0 = nm.get_specular_lobe_tan_half_angle(roughness_modified,
                                                nm.NRD_MAX_PERCENT_OF_LOBE_VOLUME)
    tana0 = tana0 * nm.lerp(nov, 1.0, roughness_modified)
    tana0 = tana0 * nlas_smb
    tana0 = tana0 / (nm.get_hit_dist_factor(h_conf, sm["frustum_size"]) + NRD_EPS)
    a0 = jnp.maximum(jnp.arctan(tana0), enc_err)
    surface_history_confidence = jnp.power(nm.saturate(nm.linearstep(a0, 0.0, a_par)), 4.0)

    # responsive accumulation (lines 656-668)
    responsive_factor = C.remap_roughness_to_responsive_factor(dc, roughness)
    smc = nm.get_spec_magic_curve(roughness_modified)
    fx = v3.dot(n3, v3.normalize(smb_navg3))
    fy = v3.dot(n3, vmb_n3)
    power = nm.lerp(32.0, 1.0, smc) * (1.0 - responsive_factor)
    fx = nm.lerp(smc, 1.0, responsive_factor) * nm.pow01(fx, power)
    fy = nm.lerp(smc, 1.0, responsive_factor) * nm.pow01(fy, power)
    max_responsive_x = jnp.maximum(dc["max_accumulated_frame_num"] * fx,
                                   dc["history_fix_frame_num"])
    max_responsive_y = jnp.maximum(dc["max_accumulated_frame_num"] * fy,
                                   dc["history_fix_frame_num"])

    smb_max_frame_num = dc["max_accumulated_frame_num"] * surface_history_confidence
    smb_max_frame_num = jnp.minimum(smb_max_frame_num, max_responsive_x)
    smb_boosted_max = jnp.maximum(smb_max_frame_num, dc["history_fix_frame_num"]
                                  * (1.0 - virtual_confidence_for_smb))
    smb_spec_accum_speed_boosted = jnp.minimum(smb_spec_accum_speed, smb_boosted_max)

    vmb_max_frame_num = dc["max_accumulated_frame_num"] * virtual_confidence
    vmb_max_frame_num = jnp.minimum(vmb_max_frame_num, max_responsive_y)

    smb_spec_accum_speed = jnp.minimum(smb_spec_accum_speed, smb_max_frame_num)
    vmb_spec_accum_speed = jnp.minimum(vmb_spec_accum_speed, vmb_max_frame_num)

    # smb <-> vmb fallback, new logic (lines 696-702)
    magic = jnp.where(vmb_spec_accum_speed > smb_spec_accum_speed, 8.0, 0.5)
    virtual_history_amount = virtual_history_amount * (
        1.0 + (vmb_spec_accum_speed - smb_spec_accum_speed)
        / (magic * jnp.maximum(vmb_spec_accum_speed, smb_spec_accum_speed) + 1.0))
    virtual_history_amount = nm.saturate(virtual_history_amount)

    # ---- virtual history sample + accumulation (lines 708-754) ----
    if sampler is not None:
        vmb_spec_history = vmb_bundle["spec_hist"]
        vmb_spec_fast = vmb_bundle["spec_fast"]
    else:
        vmb_spec_history = sample_history(spec_history, vmb_pixel_uv,
                                          sc["rect_size_prev"],
                                          vmb_occlusion_weights, vmb_allow_catrom)
        vmb_spec_fast = sample_history_bilinear(spec_fast_history, vmb_pixel_uv,
                                                sc["rect_size_prev"],
                                                vmb_occlusion_weights)

    smb_spec_history = C.clamp_negative_to_zero(smb_spec_history, occlusion)
    vmb_spec_history = C.clamp_negative_to_zero(vmb_spec_history, occlusion)

    smb_nlas = 1.0 / (1.0 + smb_spec_accum_speed)
    vmb_nlas = 1.0 / (1.0 + vmb_spec_accum_speed)
    if not (isinstance(has_data, bool) and has_data):
        # checkerboard: slower accumulation on no-data pixels (TA :731-735)
        cbra = sc["checkerboard_resolve_accum_speed"]
        smb_nlas = jnp.where(has_data, smb_nlas,
                             smb_nlas * nm.lerp(1.0 - cbra, 1.0, smb_nlas))
        vmb_nlas = jnp.where(has_data, vmb_nlas,
                             vmb_nlas * nm.lerp(1.0 - cbra, 1.0, vmb_nlas))

    smb_spec = C.mix_history_and_current(dc, smb_spec_history, spec, smb_nlas,
                                         roughness_modified, occlusion)
    vmb_spec = C.mix_history_and_current(dc, vmb_spec_history, spec, vmb_nlas,
                                         roughness_modified, occlusion)
    spec_result = nm.lerp(smb_spec, vmb_spec, virtual_history_amount[..., None])

    sh_result = None
    if spec_sh_input is not None:
        if samples is not None and "sh" in samples:
            smb_sh = samples["sh"]
            vmb_sh = vmb_bundle["sh"]
        else:
            smb_sh = sample_history_bilinear(spec_sh_history, sm["smb_pixel_uv"],
                                             sc["rect_size_prev"],
                                             sm["occlusion_weights"])
            vmb_sh = sample_history_bilinear(spec_sh_history, vmb_pixel_uv,
                                             sc["rect_size_prev"],
                                             vmb_occlusion_weights)
        smb_sh_mixed = nm.lerp(smb_sh, spec_sh_input, smb_nlas[..., None])
        vmb_sh_mixed = nm.lerp(vmb_sh, spec_sh_input, vmb_nlas[..., None])
        sh_result = nm.lerp(smb_sh_mixed, vmb_sh_mixed, virtual_history_amount[..., None])
        sh_result = jnp.concatenate([sh_result[..., :3], roughness_modified[..., None]],
                                    -1)

    spec_accum_speed = nm.lerp(smb_spec_accum_speed_boosted, vmb_spec_accum_speed,
                               virtual_history_amount)
    spec_history_mixed = nm.lerp(smb_spec_history, vmb_spec_history,
                                 virtual_history_amount[..., None])

    # firefly suppressor (lines 756-771)
    if not occlusion:
        max_rel = (dc["firefly_suppressor_min_relative_scale"]
                   + C.REBLUR_FIREFLY_SUPPRESSOR_MAX_RELATIVE_INTENSITY
                   / (spec_accum_speed + 1.0))
        antifirefly = spec_accum_speed * dc["max_blur_radius"] \
            * C.REBLUR_FIREFLY_SUPPRESSOR_RADIUS_SCALE
        antifirefly = antifirefly / (1.0 + antifirefly)
        luma = C.get_luma(spec_result, False)
        luma_clamped = jnp.minimum(luma, C.get_luma(spec_history_mixed, False) * max_rel)
        luma_clamped = nm.lerp(luma, luma_clamped, antifirefly)
        spec_result = C.change_luma(spec_result, luma_clamped, False)
        if sh_result is not None:
            scale = C.get_luma_scale(nm.length(sh_result[..., :3]), luma_clamped)
            sh_result = jnp.concatenate([sh_result[..., :3] * scale[..., None],
                                         sh_result[..., 3:]], -1)

    # fast history (lines 779-794)
    smb_fast_nlas = C.get_non_linear_accum_speed(sc, smb_spec_accum_speed,
                                                 dc["max_fast_accumulated_frame_num"],
                                                 surface_history_confidence, has_data)
    vmb_fast_nlas = C.get_non_linear_accum_speed(sc, vmb_spec_accum_speed,
                                                 dc["max_fast_accumulated_frame_num"],
                                                 virtual_confidence, has_data)
    smb_fast = nm.lerp(smb_spec_fast, C.get_luma(spec, occlusion), smb_fast_nlas)
    vmb_fast = nm.lerp(vmb_spec_fast, C.get_luma(spec, occlusion), vmb_fast_nlas)
    fast_result = nm.lerp(smb_fast, vmb_fast, virtual_history_amount)
    if not occlusion:
        fast_clamped = jnp.minimum(
            fast_result, C.get_luma(spec_history_mixed, False) * max_rel
            * C.REBLUR_FIREFLY_SUPPRESSOR_FAST_RELATIVE_INTENSITY)
        fast_result = nm.lerp(fast_result, fast_clamped, antifirefly)

    return dict(spec=spec_result, fast=fast_result, accum_speed=spec_accum_speed,
                fbits_vmb=fbits_vmb, curvature=curvature,
                virtual_history_amount=virtual_history_amount,
                hit_dist_for_tracking=hdt_out, sh=sh_result,
                # SHOW / probe taps (REBLUR_Config.hlsli:43-48)
                surface_history_confidence=surface_history_confidence,
                virtual_history_confidence=virtual_confidence,
                virtual_normal_confidence=virtual_normal_confidence,
                virtual_roughness_confidence=virtual_roughness_confidence,
                virtual_parallax_confidence=virtual_parallax_confidence)


def jax_rsqrt(x):
    import jax as _jax
    return _jax.lax.rsqrt(jnp.maximum(x, 1e-15))


# ---------------------------------------------------------------------------
# Specular spatial filter (REBLUR_Common_SpecularSpatialFilter.hlsli)
# ---------------------------------------------------------------------------

PRE_BLUR = 0


@jax.named_scope("REBLUR/specular_spatial_filter")
def specular_spatial_filter(sc, dc, mode, spec, view_z_in, normal_roughness, data1,
                            config, sh=None, *, occlusion: bool, pallas: bool = False,
                            perf_mode: bool = False, cb_mask=None):
    """Adaptive Poisson specular blur. mode: PRE_BLUR / BLUR / POST_BLUR.

    PRE_BLUR additionally estimates hitDistForTracking (stochastic min of weighted taps)
    and returns it. Returns (spec_out, sh_out, hit_dist_for_tracking_or_None).
    pallas=True runs the tap loop in kernels/reblur_pallas.spatial_filter_taps_pallas.
    """
    h, w = view_z_in.shape
    uv = resample.pixel_uv_grid(h, w)
    view_z = unpack_view_z(sc, view_z_in)
    n3, roughness, material_id = unpack_nr3(sc, normal_roughness, config)
    w2v = jnp.asarray(sc["world_to_view"])
    nv3 = v3.rotate(w2v, n3)
    u_p, v_p = uv[..., 0], uv[..., 1]
    xv3 = v3.reconstruct_view_position(u_p, v_p, sc["frustum"], view_z,
                                       sc["ortho_mode"])
    vv3 = v3.where(sc["ortho_mode"] == 0.0, v3.normalize(-xv3),
                   v3.V3.full_like(view_z, 0.0, 0.0, -1.0))
    nov = jnp.abs(v3.dot(nv3, vv3))
    n = n3.arr()
    nv = nv3.arr()
    frustum_size = nm.get_frustum_size(sc["min_rect_dim_mul_unproject"], sc["ortho_mode"],
                                       view_z)
    pixel_pos = resample.pixel_pos_grid(h, w)
    enc_err = nm.normal_encoding_error(int(config.normal_encoding))

    smc = nm.get_spec_magic_curve(roughness)

    if mode == PRE_BLUR:
        rotator = sc["rotator_pre"]
        fraction_scale = C.REBLUR_PRE_BLUR_FRACTION_SCALE
        radius_scale = 1.0
    elif mode == BLUR:
        rotator = sc["rotator"]
        fraction_scale = C.REBLUR_BLUR_FRACTION_SCALE
        radius_scale = 1.0
    else:
        rotator = sc["rotator_post"]
        fraction_scale = C.REBLUR_POST_BLUR_FRACTION_SCALE
        radius_scale = C.REBLUR_POST_BLUR_RADIUS_SCALE

    # checkerboard: params/center use the ZEROED center; taps keep the expanded signal
    spec_c = spec if cb_mask is None else spec * cb_mask[..., None]

    dv3, dvf = v3.get_specular_dominant_direction(nv3, vv3, roughness,
                                                  nm.get_specular_dominant_factor)
    nod = jnp.abs(v3.dot(nv3, dv3))
    hit_dist_scale = fe.get_hit_distance_normalization(
        view_z, dc["hit_dist_params"][None, None, :], roughness)
    hit_dist = C.extract_hit_dist(spec_c) * hit_dist_scale
    hit_dist_factor = nm.get_hit_dist_factor(hit_dist, frustum_size)

    if mode == PRE_BLUR:
        hit_dist_for_tracking = jnp.where(hit_dist == 0.0, NRD_INF, hit_dist)
        blur_radius = dc["spec_prepass_blur_radius"]
        area_factor = roughness * hit_dist_factor
        nlas = jnp.full_like(view_z, C.REBLUR_PRE_BLUR_NON_LINEAR_ACCUM_SPEED)
    else:
        hit_dist_for_tracking = None
        boost = 1.0 - C.get_fade_based_on_accumulated_frames(dc, data1)
        boost = boost * (1.0 - jnp.power(nm.saturate(1.0 - nov), 5.0))
        boost = boost * smc
        nlas = 1.0 / (1.0 + C.REBLUR_SAMPLES_PER_FRAME * (1.0 - boost) * data1)
        blur_radius = dc["max_blur_radius"]
        area_factor = roughness * hit_dist_factor * nlas

    blur_radius = blur_radius * jnp.sqrt(nm.saturate(area_factor))

    if mode == PRE_BLUR:
        # lobe-bound radius fix (lines 71-80)
        lobe_tan = nm.get_specular_lobe_tan_half_angle(
            roughness, C.REBLUR_MAX_PERCENT_OF_LOBE_VOLUME_FOR_PRE_PASS)
        lobe_radius = hit_dist * nod * lobe_tan
        min_blur_radius = lobe_radius / nm.pixel_radius_to_world(
            sc["unproject"], sc["ortho_mode"], 1.0, view_z + hit_dist * dvf)
        blur_radius = jnp.minimum(blur_radius, min_blur_radius)

    blur_radius = blur_radius * radius_scale
    blur_radius = jnp.maximum(blur_radius, dc["min_blur_radius"] * smc)

    roughness_fraction_scaled = nm.saturate(dc["roughness_fraction"] * fraction_scale)
    ga = 1.0 / (dc["plane_dist_sensitivity"] * frustum_size)
    gb = -v3.dot(nv3, xv3) * ga
    normal_weight_param = nm.get_normal_weight_param(nlas, dc["lobe_angle_fraction"],
                                                     roughness, enc_err) / fraction_scale
    wr_a, wr_b = nm.get_roughness_weight_params(roughness, roughness_fraction_scaled)
    ha, hb = nm.get_hit_distance_weight_params(C.extract_hit_dist(spec_c), nlas,
                                               roughness)
    min_hit_dist_weight = dc["min_hit_distance_weight"] * fraction_scale * smc
    if mode != PRE_BLUR and not occlusion:
        min_hit_dist_weight = min_hit_dist_weight * jnp.sqrt(nlas)

    if pallas:
        from ...kernels import get_spatial_filter

        spatial_filter_taps_pallas = get_spatial_filter()

        prepass = mode == PRE_BLUR
        rnd8 = None
        if prepass:
            rnd8 = []
            rng_state = nm.hash_init((pixel_pos[..., 0], pixel_pos[..., 1]),
                                     sc["frame_index"])
            for _ in range(8):
                rng_state, rnd = nm.hash_float(rng_state)
                rnd8.append(rnd)
        mhdw = jnp.broadcast_to(jnp.asarray(min_hit_dist_weight, jnp.float32),
                                view_z.shape)
        res = spatial_filter_taps_pallas(
            sc, dc, config, rotator=rotator, signal=spec, sh=sh, view_z_in=view_z_in,
            normal_roughness=normal_roughness, blur_radius=blur_radius, ga=ga, gb=gb,
            normal_weight_param=normal_weight_param, ha=ha, hb=hb,
            min_hit_dist_weight=mhdw, material_id=material_id, n=n, nv=nv,
            wr_a=wr_a, wr_b=wr_b, hit_dist=hit_dist, roughness=roughness, rnd8=rnd8,
            spec=True, prepass=prepass, perf_mode=perf_mode, cb_mask=cb_mask)
        out, out_sh, hdt = res[0], res[1], res[2]
        if cb_mask is not None:
            resolved = cb_neighbor_resolve(sc, spec, view_z, frustum_size, nov)
            out = jnp.where((res[3] == 0.0)[..., None], resolved, out)
            if out_sh is not None:
                sh_res = cb_neighbor_resolve(sc, sh, view_z, frustum_size, nov)
                out_sh = jnp.where((res[3] == 0.0)[..., None], sh_res, out_sh)
        if prepass:
            if cb_mask is None:
                disabled = dc["spec_prepass_blur_radius"] == 0.0
                out = jnp.where(disabled, spec, out)
                if out_sh is not None:
                    out_sh = jnp.where(disabled, sh, out_sh)
                hdt = jnp.where(disabled, C.extract_hit_dist(spec), hdt)
            return out, out_sh, hdt
        return out, out_sh, None

    xv = xv3.arr()  # XLA reference path below keeps (h, w, 3) arrays
    # screen-space sampling path (PRE_BLUR always; others via config default 0 -> but we
    # use screen-space everywhere for TPU friendliness; skew=1 mirrors the pre-pass)
    skew = jnp.ones_like(uv) * sc["rect_size_inv"][None, None, :] * blur_radius[..., None]
    scaled_rotator = nm.scale_rotator(jnp.broadcast_to(rotator, uv.shape[:2] + (4,)), skew)

    rect = sc["rect_size"][None, None, :]
    sum_ = jnp.ones_like(view_z) if cb_mask is None else cb_mask
    acc = spec_c
    acc_sh = sh if cb_mask is None or sh is None else sh * cb_mask[..., None]
    rng_state = nm.hash_init((pixel_pos[..., 0], pixel_pos[..., 1]), sc["frame_index"])

    for tap in (nm.SPECIAL_6 if perf_mode else nm.SPECIAL_8):
        offset = jnp.asarray(tap[:2])
        uv_s = uv + nm.rotate_vector2(scaled_rotator, jnp.broadcast_to(offset, uv.shape))
        uv_s = (jnp.floor(uv_s * rect) + 0.5) / rect

        zs = unpack_view_z(sc, resample.sample_nearest(view_z_in, uv_s))
        ns, rs, ms = unpack_nr(sc, resample.sample_nearest(normal_roughness, uv_s), config)

        angle = nm.acos_approx(nm.dot(n, ns))
        xvs = nm.reconstruct_view_position(uv_s, sc["frustum"][None, None, :], zs,
                                           sc["ortho_mode"])
        w_ = resample.is_in_screen_nearest(uv_s)
        w_ = w_ * nm.compute_weight(nm.dot(nv, xvs), ga, gb)
        if config.normal_encoding.name == "R10_G10_B10_A2_UNORM":
            w_ = w_ * (jnp.maximum(material_id, dc["spec_min_material"])
                       == jnp.maximum(ms, dc["spec_min_material"])).astype(jnp.float32)
        w_ = w_ * nm.compute_weight(angle, normal_weight_param, 0.0)
        w_ = w_ * nm.compute_weight(rs, wr_a, wr_b)

        s = resample.sample_nearest(spec, uv_s)
        s = jnp.where((w_ == 0.0)[..., None], 0.0, s)

        if mode == PRE_BLUR:
            hs = C.extract_hit_dist(s) * fe.get_hit_distance_normalization(
                zs, dc["hit_dist_params"][None, None, :], rs)
            d = nm.length(xvs - xv) + NRD_EPS
            geometry_weight = w_ * nm.saturate(hs / d)
            rng_state, rnd = nm.hash_float(rng_state)
            take = jnp.logical_and(rnd < geometry_weight, hs > 0.0)
            hit_dist_for_tracking = jnp.where(
                take, jnp.minimum(hit_dist_for_tracking, hs), hit_dist_for_tracking)
            w_ = w_ * dc["use_prepass_not_only_for_specular_motion_estimation"]
            t = hs / (d + hit_dist)
            w_ = w_ * nm.lerp(nm.saturate(t), 1.0, nm.linearstep(0.5, 1.0, roughness))

        w_ = w_ * nm.lerp(min_hit_dist_weight, 1.0,
                          nm.compute_exponential_weight(C.extract_hit_dist(s), ha, hb))
        w_ = w_ * nm.get_gaussian_weight(float(tap[2]))

        sum_ = sum_ + w_
        acc = acc + s * w_[..., None]
        if acc_sh is not None:
            sh_s = resample.sample_nearest(sh, uv_s)
            sh_s = jnp.where((w_ == 0.0)[..., None], 0.0, sh_s)
            acc_sh = acc_sh + jnp.concatenate([sh_s[..., :3] * w_[..., None],
                                               jnp.zeros_like(sh_s[..., 3:])], -1)

    inv = 1.0 / jnp.maximum(sum_, 1e-15)
    out = acc * inv[..., None]
    out_sh = None
    if acc_sh is not None:
        out_sh = jnp.concatenate([acc_sh[..., :3] * inv[..., None], acc_sh[..., 3:]], -1)
    if cb_mask is not None:
        resolved = cb_neighbor_resolve(sc, spec, view_z, frustum_size, nov)
        out = jnp.where((sum_ == 0.0)[..., None], resolved, out)
        if out_sh is not None:
            sh_res = cb_neighbor_resolve(sc, sh, view_z, frustum_size, nov)
            out_sh = jnp.where((sum_ == 0.0)[..., None], sh_res, out_sh)
    if mode == PRE_BLUR:
        hit_dist_for_tracking = jnp.where(hit_dist_for_tracking == NRD_INF, 0.0,
                                          hit_dist_for_tracking)
        if cb_mask is None:
            disabled = dc["spec_prepass_blur_radius"] == 0.0
            out = jnp.where(disabled, spec, out)
            if out_sh is not None:
                out_sh = jnp.where(disabled, sh, out_sh)
            hit_dist_for_tracking = jnp.where(
                disabled, jnp.where(C.extract_hit_dist(spec) == 0.0, 0.0,
                                    C.extract_hit_dist(spec)), hit_dist_for_tracking)
    return out, out_sh, hit_dist_for_tracking


@jax.named_scope("REBLUR/filter_geometry")
def make_filter_geometry(sc, dc, view_z_in, normal_roughness, config):
    """Shared per-frame geometry for the fused spatial filters / history fix.

    Everything here depends only on the frame's G-buffer (viewZ, normal/roughness),
    not on any signal - computed ONCE per frame and reused by prepass, history fix,
    blur and post-blur instead of re-deriving ~15 decoded planes in each stage's XLA
    glue (the reference reloads these per pass from textures; on TPU the rebuild was
    measured at ~1 ms of VPU work per pass call)."""
    h, w = view_z_in.shape
    uv = resample.pixel_uv_grid(h, w)
    view_z = unpack_view_z(sc, view_z_in)
    n3, roughness, material_id = unpack_nr3(sc, normal_roughness, config)
    w2v = jnp.asarray(sc["world_to_view"])
    nv3 = v3.rotate(w2v, n3)
    u_p, v_p = uv[..., 0], uv[..., 1]
    xv3 = v3.reconstruct_view_position(u_p, v_p, sc["frustum"], view_z,
                                       sc["ortho_mode"])
    vv3 = v3.where(sc["ortho_mode"] == 0.0, v3.normalize(-xv3),
                   v3.V3.full_like(view_z, 0.0, 0.0, -1.0))
    nov = jnp.abs(v3.dot(nv3, vv3))
    frustum_size = nm.get_frustum_size(sc["min_rect_dim_mul_unproject"],
                                       sc["ortho_mode"], view_z)
    ga = 1.0 / (dc["plane_dist_sensitivity"] * frustum_size)
    gb = -v3.dot(nv3, xv3) * ga
    return dict(view_z=view_z, n3=n3, n=n3.arr(), roughness=roughness,
                material_id=material_id, nv3=nv3, nv=nv3.arr(), nov=nov, vv3=vv3,
                frustum_size=frustum_size, ga=ga, gb=gb,
                smc=nm.get_spec_magic_curve(roughness),
                enc_err=nm.normal_encoding_error(int(config.normal_encoding)),
                hd_scale_diff=fe.get_hit_distance_normalization(
                    view_z, dc["hit_dist_params"][None, None, :],
                    jnp.ones_like(roughness)),
                hd_scale_spec=fe.get_hit_distance_normalization(
                    view_z, dc["hit_dist_params"][None, None, :], roughness))


def _fused_diff_params(sc, dc, mode, geom, signal, data1, cb_mask, occlusion):
    """Per-signal kernel params for the diffuse side of the fused filter.

    Formula source: diffuse_spatial_filter (BLUR/POST_BLUR) / diffuse_pre_pass
    (PRE_BLUR) - kept line-for-line equivalent."""
    view_z = geom["view_z"]
    sig_c = signal if cb_mask is None else signal * cb_mask[..., None]
    hit_dist = C.extract_hit_dist(sig_c) * geom["hd_scale_diff"]
    hit_dist_factor = nm.get_hit_dist_factor(hit_dist, geom["frustum_size"])
    if mode == PRE_BLUR:
        fraction_scale = C.REBLUR_PRE_BLUR_FRACTION_SCALE
        nlas = jnp.full_like(view_z, C.REBLUR_PRE_BLUR_NON_LINEAR_ACCUM_SPEED)
        blur_radius = dc["diff_prepass_blur_radius"] * jnp.sqrt(
            nm.saturate(hit_dist_factor))
        mhdw = dc["min_hit_distance_weight"] * fraction_scale
    else:
        fraction_scale = (C.REBLUR_BLUR_FRACTION_SCALE if mode == BLUR
                          else C.REBLUR_POST_BLUR_FRACTION_SCALE)
        radius_scale = 1.0 if mode == BLUR else C.REBLUR_POST_BLUR_RADIUS_SCALE
        boost = 1.0 - C.get_fade_based_on_accumulated_frames(dc, data1)
        boost = boost * (1.0 - jnp.power(nm.saturate(1.0 - geom["nov"]), 5.0))
        nlas = 1.0 / (1.0 + C.REBLUR_SAMPLES_PER_FRAME * (1.0 - boost) * data1)
        blur_radius = dc["max_blur_radius"] * jnp.sqrt(
            nm.saturate(hit_dist_factor * nlas)) * radius_scale
        mhdw = dc["min_hit_distance_weight"] * fraction_scale
        if not occlusion:
            mhdw = mhdw * jnp.sqrt(nlas)
    blur_radius = jnp.maximum(blur_radius, dc["min_blur_radius"])
    nwp = nm.get_normal_weight_param(
        nlas, dc["lobe_angle_fraction"], jnp.ones_like(view_z),
        geom["enc_err"]) / fraction_scale
    ha, hb = nm.get_hit_distance_weight_params(C.extract_hit_dist(sig_c), nlas)
    return dict(blur_radius=blur_radius, normal_weight_param=nwp, ha=ha, hb=hb,
                min_hit_dist_weight=jnp.broadcast_to(
                    jnp.asarray(mhdw, jnp.float32), view_z.shape),
                min_material=dc.get("diff_min_material", 0.0))


def _fused_spec_params(sc, dc, mode, geom, signal, data1, cb_mask, occlusion):
    """Per-signal kernel params for the specular side (specular_spatial_filter)."""
    view_z = geom["view_z"]
    roughness = geom["roughness"]
    smc = geom["smc"]
    sig_c = signal if cb_mask is None else signal * cb_mask[..., None]
    hit_dist = C.extract_hit_dist(sig_c) * geom["hd_scale_spec"]
    hit_dist_factor = nm.get_hit_dist_factor(hit_dist, geom["frustum_size"])

    if mode == PRE_BLUR:
        fraction_scale = C.REBLUR_PRE_BLUR_FRACTION_SCALE
        radius_scale = 1.0
        blur_radius = dc["spec_prepass_blur_radius"]
        area_factor = roughness * hit_dist_factor
        nlas = jnp.full_like(view_z, C.REBLUR_PRE_BLUR_NON_LINEAR_ACCUM_SPEED)
    else:
        fraction_scale = (C.REBLUR_BLUR_FRACTION_SCALE if mode == BLUR
                          else C.REBLUR_POST_BLUR_FRACTION_SCALE)
        radius_scale = 1.0 if mode == BLUR else C.REBLUR_POST_BLUR_RADIUS_SCALE
        boost = 1.0 - C.get_fade_based_on_accumulated_frames(dc, data1)
        boost = boost * (1.0 - jnp.power(nm.saturate(1.0 - geom["nov"]), 5.0))
        boost = boost * smc
        nlas = 1.0 / (1.0 + C.REBLUR_SAMPLES_PER_FRAME * (1.0 - boost) * data1)
        blur_radius = dc["max_blur_radius"]
        area_factor = roughness * hit_dist_factor * nlas
    blur_radius = blur_radius * jnp.sqrt(nm.saturate(area_factor))
    if mode == PRE_BLUR:
        dv3, dvf = v3.get_specular_dominant_direction(
            geom["nv3"], geom["vv3"], roughness, nm.get_specular_dominant_factor)
        nod = jnp.abs(v3.dot(geom["nv3"], dv3))
        lobe_tan = nm.get_specular_lobe_tan_half_angle(
            roughness, C.REBLUR_MAX_PERCENT_OF_LOBE_VOLUME_FOR_PRE_PASS)
        lobe_radius = hit_dist * nod * lobe_tan
        min_blur_radius = lobe_radius / nm.pixel_radius_to_world(
            sc["unproject"], sc["ortho_mode"], 1.0, view_z + hit_dist * dvf)
        blur_radius = jnp.minimum(blur_radius, min_blur_radius)
    blur_radius = blur_radius * radius_scale
    blur_radius = jnp.maximum(blur_radius, dc["min_blur_radius"] * smc)

    roughness_fraction_scaled = nm.saturate(dc["roughness_fraction"] * fraction_scale)
    nwp = nm.get_normal_weight_param(nlas, dc["lobe_angle_fraction"], roughness,
                                     geom["enc_err"]) / fraction_scale
    wr_a, wr_b = nm.get_roughness_weight_params(roughness, roughness_fraction_scaled)
    ha, hb = nm.get_hit_distance_weight_params(C.extract_hit_dist(sig_c), nlas,
                                               roughness)
    mhdw = dc["min_hit_distance_weight"] * fraction_scale * smc
    if mode != PRE_BLUR and not occlusion:
        mhdw = mhdw * jnp.sqrt(nlas)
    out = dict(blur_radius=blur_radius, normal_weight_param=nwp, ha=ha, hb=hb,
               min_hit_dist_weight=jnp.broadcast_to(
                   jnp.asarray(mhdw, jnp.float32), view_z.shape),
               min_material=dc.get("spec_min_material", 0.0),
               spec=True, wr_a=wr_a, wr_b=wr_b)
    if mode == PRE_BLUR:
        out["hit_dist"] = hit_dist
    return out


@jax.named_scope("REBLUR/fused_spatial_filter")
def fused_spatial_filter(sc, dc, mode, geom, view_z_in, config, *, diff=None,
                         spec=None, occlusion=False, perf_mode=False, mesh=None):
    """One fused Pallas launch running the diffuse AND specular spatial filter.

    mode: PRE_BLUR / BLUR / POST_BLUR. diff/spec: dicts {signal, sh, data1, cb_mask}
    (data1 unused for PRE_BLUR). Returns
    {diff, diff_sh, spec, spec_sh, spec_hdt} with the same per-signal outputs as
    diffuse_pre_pass / diffuse_spatial_filter / specular_spatial_filter."""
    from ...kernels.reblur_fused import spatial_filter_fused_pallas

    # Sky pixels never accumulate (data1 stays 0) so their blur radius pins at max,
    # dragging whole blocks to the top tap level in the Pallas kernels even though
    # sky output is passthrough and sky taps carry zero weight. Zero the radius on
    # dead pixels so block rmax reflects live pixels only (the reference's tile cull
    # achieves this by never launching sky CTAs, Common.hlsli:118-135).
    dead = geom.get("dead")

    def _live_radius(p):
        if dead is not None:
            p["blur_radius"] = jnp.where(dead, 0.0, p["blur_radius"])
        return p

    signals = []
    order = []
    if diff is not None:
        p = _live_radius(_fused_diff_params(sc, dc, mode, geom, diff["signal"],
                                            diff.get("data1"), diff.get("cb_mask"),
                                            occlusion))
        p.update(signal=diff["signal"], sh=diff.get("sh"),
                 cb_mask=diff.get("cb_mask"))
        signals.append(p)
        order.append("diff")
    if spec is not None:
        p = _live_radius(_fused_spec_params(sc, dc, mode, geom, spec["signal"],
                                            spec.get("data1"), spec.get("cb_mask"),
                                            occlusion))
        p.update(signal=spec["signal"], sh=spec.get("sh"),
                 cb_mask=spec.get("cb_mask"))
        if mode == PRE_BLUR:
            p["prepass"] = True
            h, w = view_z_in.shape
            pixel_pos = resample.pixel_pos_grid(h, w)
            rng_state = nm.hash_init((pixel_pos[..., 0], pixel_pos[..., 1]),
                                     sc["frame_index"])
            rnd8 = []
            for _ in range(8):
                rng_state, rnd = nm.hash_float(rng_state)
                rnd8.append(rnd)
            p["rnd"] = rnd8
        signals.append(p)
        order.append("spec")

    res = spatial_filter_fused_pallas(
        sc, dc, config, signals=signals, view_z_in=view_z_in, n=geom["n"],
        nv=geom["nv"], roughness=geom["roughness"],
        material_id=geom["material_id"], ga=geom["ga"], gb=geom["gb"],
        perf_mode=perf_mode, dead=geom.get("dead"), mesh=mesh)

    out = {"diff": None, "diff_sh": None, "spec": None, "spec_sh": None,
           "spec_hdt": None}
    for name, src, r in zip(order, signals, res):
        sig_out, sh_out = r["signal"], r["sh"]
        if src.get("cb_mask") is not None:
            resolved = cb_neighbor_resolve(sc, src["signal"], geom["view_z"],
                                           geom["frustum_size"], geom["nov"])
            sig_out = jnp.where((r["wsum"] == 0.0)[..., None], resolved, sig_out)
            if sh_out is not None:
                sh_res = cb_neighbor_resolve(sc, src["sh"], geom["view_z"],
                                             geom["frustum_size"], geom["nov"])
                sh_out = jnp.where((r["wsum"] == 0.0)[..., None], sh_res, sh_out)
        if mode == PRE_BLUR and src.get("cb_mask") is None:
            key = "diff_prepass_blur_radius" if name == "diff" \
                else "spec_prepass_blur_radius"
            disabled = dc[key] == 0.0
            sig_out = jnp.where(disabled, src["signal"], sig_out)
            if sh_out is not None:
                sh_out = jnp.where(disabled, src["sh"], sh_out)
            if r["hdt"] is not None:
                r["hdt"] = jnp.where(disabled, C.extract_hit_dist(src["signal"]),
                                     r["hdt"])
        out[name] = sig_out
        out[name + "_sh"] = sh_out
        if r["hdt"] is not None:
            out["spec_hdt"] = r["hdt"]
    return out


def _fused_hfix_params(sc, dc, geom, signal, data1, is_diffuse):
    """Per-signal history-fix params (formula source: history_fix above)."""
    roughness = geom["roughness"]
    frame_num = data1
    stride = dc["history_fix_base_pixel_stride"] / (2.0 + frame_num)
    stride = stride * (frame_num < dc["history_fix_frame_num"]).astype(jnp.float32)
    if not is_diffuse:
        stride = stride * nm.lerp(0.5, 1.0, geom["smc"])
    stride = jnp.floor(stride)
    nlas = 1.0 / (1.0 + frame_num)
    nwp = nm.get_normal_weight_param(
        nlas, dc["lobe_angle_fraction"],
        roughness if not is_diffuse else jnp.ones_like(roughness), geom["enc_err"])
    hd_scale = geom["hd_scale_diff"] if is_diffuse else geom["hd_scale_spec"]
    hit_dist = C.extract_hit_dist(signal) * hd_scale
    hit_dist_factor = nm.get_hit_dist_factor(hit_dist, geom["frustum_size"])
    ha, hb = nm.get_hit_distance_weight_params(
        hit_dist_factor, nlas,
        jnp.ones_like(roughness) if is_diffuse else roughness)
    p = dict(stride=stride, normal_weight_param=nwp, ha=ha, hb=hb,
             frame_num=frame_num, data1=data1, hit_dist_scale=hd_scale,
             min_material=dc.get(
                 "diff_min_material" if is_diffuse else "spec_min_material", 0.0))
    if not is_diffuse:
        ra, rb = nm.get_relaxed_roughness_weight_params(
            roughness * roughness, jnp.sqrt(dc["roughness_fraction"]))
        p.update(spec=True, ra=ra, rb=rb, hit_dist=hit_dist,
                 bguide=nm.linearstep(0.03, 0.05, roughness))
    return p


@jax.named_scope("REBLUR/fused_history_fix")
def fused_history_fix(sc, dc, geom, view_z_in, config, *, diff=None, spec=None,
                      occlusion=False, directional=False, perf_mode=False, mesh=None):
    """One fused Pallas launch running diffuse AND specular history fix.

    diff/spec: dicts {signal, sh, data1, fast_history, anti_firefly}. Returns
    {diff: (signal, fast, sh), spec: (...)} matching history_fix's outputs."""
    from ...kernels.reblur_fused import history_fix_fused_pallas

    signals, order = [], []
    for name, s, is_d in (("diff", diff, True), ("spec", spec, False)):
        if s is None:
            continue
        p = _fused_hfix_params(sc, dc, geom, s["signal"], s["data1"], is_d)
        if geom.get("dead") is not None:
            # sky never accumulates -> stride pins at max; see fused_spatial_filter.
            # Sky output is passthrough and the stride==0 select keeps it unfixed.
            p["stride"] = jnp.where(geom["dead"], 0.0, p["stride"])
        p.update(signal=s["signal"], sh=s.get("sh"),
                 fast_history=s["fast_history"],
                 anti_firefly=bool(s.get("anti_firefly")))
        signals.append(p)
        order.append((name, s, is_d))

    res = history_fix_fused_pallas(
        sc, dc, config, signals=signals, view_z_in=view_z_in, n=geom["n"],
        nv=geom["nv"], roughness=geom["roughness"],
        material_id=geom["material_id"], ga=geom["ga"], gb=geom["gb"],
        frustum_size=geom["frustum_size"], perf_mode=perf_mode,
        dead=geom.get("dead"), mesh=mesh,
        occlusion=occlusion, directional=directional)

    # the fast-history clamp chain (_hfix_post) runs IN-KERNEL since round 5 -
    # the launch returns final (signal, fast, sh) directly
    out = {}
    for (name, s, is_d), r in zip(order, res):
        out[name] = (r["signal"], r["fast"], r["sh"])
    return out


@jax.named_scope("REBLUR/diffuse_pre_pass")
def diffuse_pre_pass(sc, dc, spec_like_signal, view_z_in, normal_roughness, config,
                     sh=None, *, occlusion: bool = False, pallas: bool = False,
                     perf_mode: bool = False, cb_mask=None):
    """Diffuse PRE_BLUR: same as diffuse_spatial_filter but with pre-pass constants.

    cb_mask: checkerboard has-data mask (h, w) float; no-data centers get zero weight
    and the wc neighbor fallback handles pixels where every tap failed."""
    h, w = view_z_in.shape
    uv = resample.pixel_uv_grid(h, w)
    view_z = unpack_view_z(sc, view_z_in)
    n3, roughness, material_id = unpack_nr3(sc, normal_roughness, config)
    w2v = jnp.asarray(sc["world_to_view"])
    nv3 = v3.rotate(w2v, n3)
    u_p, v_p = uv[..., 0], uv[..., 1]
    xv3 = v3.reconstruct_view_position(u_p, v_p, sc["frustum"], view_z,
                                       sc["ortho_mode"])
    n = n3.arr()
    nv = nv3.arr()
    xv = xv3.arr()
    frustum_size = nm.get_frustum_size(sc["min_rect_dim_mul_unproject"], sc["ortho_mode"],
                                       view_z)
    rotator = sc["rotator_pre"]
    signal = spec_like_signal
    enc_err = nm.normal_encoding_error(int(config.normal_encoding))

    # checkerboard: params and the center contribution use the ZEROED center signal
    # (REBLUR_PrePass.hlsli:64-78); tap windows keep the expanded full-res signal
    sig_c = signal if cb_mask is None else signal * cb_mask[..., None]

    nlas = jnp.full_like(view_z, C.REBLUR_PRE_BLUR_NON_LINEAR_ACCUM_SPEED)
    fraction_scale = C.REBLUR_PRE_BLUR_FRACTION_SCALE

    hit_dist_scale = fe.get_hit_distance_normalization(
        view_z, dc["hit_dist_params"][None, None, :], jnp.ones_like(roughness))
    hit_dist = C.extract_hit_dist(sig_c) * hit_dist_scale
    hit_dist_factor = nm.get_hit_dist_factor(hit_dist, frustum_size)

    blur_radius = dc["diff_prepass_blur_radius"] * jnp.sqrt(nm.saturate(hit_dist_factor))
    blur_radius = jnp.maximum(blur_radius, dc["min_blur_radius"])

    ga = 1.0 / (dc["plane_dist_sensitivity"] * frustum_size)
    gb = -v3.dot(nv3, xv3) * ga
    normal_weight_param = nm.get_normal_weight_param(
        nlas, dc["lobe_angle_fraction"], jnp.ones_like(roughness), enc_err) / fraction_scale
    ha, hb = nm.get_hit_distance_weight_params(C.extract_hit_dist(sig_c), nlas)
    min_hit_dist_weight = dc["min_hit_distance_weight"] * fraction_scale

    def cb_fallback(out, sum_, src):
        if cb_mask is None:
            return out
        vv_ = C.get_view_vector_view_space(sc, xv)
        nov_ = jnp.abs(nm.dot(nv, vv_))
        resolved = cb_neighbor_resolve(sc, src, view_z, frustum_size, nov_)
        return jnp.where((sum_ == 0.0)[..., None], resolved, out)

    if pallas:
        from ...kernels import get_spatial_filter

        spatial_filter_taps_pallas = get_spatial_filter()

        mhdw = jnp.broadcast_to(jnp.asarray(min_hit_dist_weight, jnp.float32),
                                view_z.shape)
        res = spatial_filter_taps_pallas(
            sc, dc, config, rotator=rotator, signal=signal, sh=sh,
            view_z_in=view_z_in, normal_roughness=normal_roughness,
            blur_radius=blur_radius, ga=ga, gb=gb,
            normal_weight_param=normal_weight_param, ha=ha, hb=hb,
            min_hit_dist_weight=mhdw, material_id=material_id, n=n, nv=nv,
            perf_mode=perf_mode, cb_mask=cb_mask)
        out, out_sh = res[0], res[1]
        if cb_mask is not None:
            out = cb_fallback(out, res[3], signal)
            if out_sh is not None:
                out_sh = cb_fallback(out_sh, res[3], sh)
        else:
            disabled = dc["diff_prepass_blur_radius"] == 0.0
            out = jnp.where(disabled, signal, out)
            if out_sh is not None:
                out_sh = jnp.where(disabled, sh, out_sh)
        return out, out_sh

    skew = jnp.ones_like(uv) * sc["rect_size_inv"][None, None, :] * blur_radius[..., None]
    scaled_rotator = nm.scale_rotator(jnp.broadcast_to(rotator, uv.shape[:2] + (4,)), skew)
    rect = sc["rect_size"][None, None, :]

    cw0 = jnp.ones_like(view_z) if cb_mask is None else cb_mask
    sum_ = cw0
    acc = sig_c
    acc_sh = sh if cb_mask is None or sh is None else sh * cb_mask[..., None]
    for tap in (nm.SPECIAL_6 if perf_mode else nm.SPECIAL_8):
        offset = jnp.asarray(tap[:2])
        uv_s = uv + nm.rotate_vector2(scaled_rotator, jnp.broadcast_to(offset, uv.shape))
        uv_s = (jnp.floor(uv_s * rect) + 0.5) / rect
        zs = unpack_view_z(sc, resample.sample_nearest(view_z_in, uv_s))
        ns, rs, ms = unpack_nr(sc, resample.sample_nearest(normal_roughness, uv_s), config)
        angle = nm.acos_approx(nm.dot(n, ns))
        xvs = nm.reconstruct_view_position(uv_s, sc["frustum"][None, None, :], zs,
                                           sc["ortho_mode"])
        w_ = resample.is_in_screen_nearest(uv_s)
        w_ = w_ * nm.compute_weight(nm.dot(nv, xvs), ga, gb)
        if config.normal_encoding.name == "R10_G10_B10_A2_UNORM":
            w_ = w_ * (jnp.maximum(material_id, dc["diff_min_material"])
                       == jnp.maximum(ms, dc["diff_min_material"])).astype(jnp.float32)
        w_ = w_ * nm.compute_weight(angle, normal_weight_param, 0.0)
        s = resample.sample_nearest(signal, uv_s)
        s = jnp.where((w_ == 0.0)[..., None], 0.0, s)
        w_ = w_ * nm.lerp(min_hit_dist_weight, 1.0,
                          nm.compute_exponential_weight(C.extract_hit_dist(s), ha, hb))
        w_ = w_ * nm.get_gaussian_weight(float(tap[2]))
        sum_ = sum_ + w_
        acc = acc + s * w_[..., None]
        if acc_sh is not None:
            sh_s = resample.sample_nearest(sh, uv_s)
            sh_s = jnp.where((w_ == 0.0)[..., None], 0.0, sh_s)
            acc_sh = acc_sh + sh_s * w_[..., None]

    inv = 1.0 / jnp.maximum(sum_, 1e-15)
    out = acc * inv[..., None]
    out_sh = acc_sh * inv[..., None] if acc_sh is not None else None
    if cb_mask is not None:
        out = cb_fallback(out, sum_, signal)
        if out_sh is not None:
            out_sh = cb_fallback(out_sh, sum_, sh)
    if cb_mask is None:
        disabled = dc["diff_prepass_blur_radius"] == 0.0
        out = jnp.where(disabled, signal, out)
        if out_sh is not None:
            out_sh = jnp.where(disabled, sh, out_sh)
    return out, out_sh


# ---------------------------------------------------------------------------
# Hit distance reconstruction (REBLUR_HitDistReconstruction.hlsli)
# ---------------------------------------------------------------------------


@jax.named_scope("REBLUR/hit_dist_reconstruction")
def hit_dist_reconstruction(sc, dc, view_z_in, normal_roughness, diff, spec, config,
                            *, radius: int, pallas: bool = False, mesh=None):
    """Reconstruct hitT==0 holes from 3x3 (radius=1) / 5x5 (radius=2) neighbors.

    diff/spec are (h, w, c) signals or None; only the hit channel is modified.
    """
    view_z = unpack_view_z(sc, view_z_in)
    h, w = view_z.shape
    uv = resample.pixel_uv_grid(h, w)
    n, roughness, _ = unpack_nr(sc, normal_roughness, config)
    w2v = jnp.asarray(sc["world_to_view"])
    nv = n @ w2v[:3, :3].T
    xv = nm.reconstruct_view_position(uv, sc["frustum"][None, None, :], view_z,
                                      sc["ortho_mode"])
    frustum_size = nm.get_frustum_size(sc["min_rect_dim_mul_unproject"], sc["ortho_mode"],
                                       view_z)
    enc_err = nm.normal_encoding_error(int(config.normal_encoding))

    ga, gb = nm.get_geometry_weight_params(dc["plane_dist_sensitivity"], frustum_size,
                                           xv, nv, 1.0)
    ra, rb = nm.get_relaxed_roughness_weight_params(roughness * roughness)
    diff_nwp = nm.get_normal_weight_param(jnp.ones_like(view_z), 1.0,
                                          jnp.ones_like(roughness), enc_err)
    spec_nwp = nm.get_normal_weight_param(jnp.ones_like(view_z), 1.0, roughness, enc_err)

    hd_d = C.extract_hit_dist(diff) if diff is not None else None
    hd_s = C.extract_hit_dist(spec) if spec is not None else None

    if pallas:
        from ...kernels.reblur_pallas import hitdist_recon_pallas

        new_hd_d, new_hd_s = hitdist_recon_pallas(
            sc, dc, config, radius=radius, view_z_in=view_z_in,
            normal_roughness=normal_roughness, hd_d=hd_d, hd_s=hd_s, ga=ga, gb=gb,
            diff_nwp=diff_nwp, spec_nwp=spec_nwp, ra=ra, rb=rb, n=n, nv=nv,
            mesh=mesh)
        out_d = out_s = None
        if diff is not None:
            out_d = jnp.concatenate([diff[..., :-1], new_hd_d[..., None]], -1)
        if spec is not None:
            out_s = jnp.concatenate([spec[..., :-1], new_hd_s[..., None]], -1)
        return out_d, out_s

    sum_d = 1000.0 * (hd_d != 0.0).astype(jnp.float32) if hd_d is not None else None
    sum_s = 1000.0 * (hd_s != 0.0).astype(jnp.float32) if hd_s is not None else None
    acc_d = hd_d * sum_d if hd_d is not None else None
    acc_s = hd_s * sum_s if hd_s is not None else None

    rect_inv = sc["rect_size_inv"][None, None, :]
    for dy, dx in stencil.offsets_square(radius, exclude_center=True):
        zs = stencil.shifted(view_z, dy, dx)
        ns, rs, _ = unpack_nr(sc, stencil.shifted(normal_roughness, dy, dx), config)
        o_len = float((dx * dx + dy * dy) ** 0.5)
        uv_s = uv + jnp.asarray([dx, dy], jnp.float32) * rect_inv
        xvs = nm.reconstruct_view_position(uv_s, sc["frustum"][None, None, :], zs,
                                           sc["ortho_mode"])
        w_ = resample.is_in_screen_nearest(uv_s)
        w_ = w_ * nm.get_gaussian_weight(o_len * 0.5)
        w_ = w_ * nm.compute_weight(nm.dot(nv, xvs), ga, gb)
        angle = nm.acos_approx(nm.dot(n, ns))
        if hd_d is not None:
            wd = w_ * nm.compute_exponential_weight(angle, diff_nwp, 0.0)
            d_tap = stencil.shifted(hd_d, dy, dx)
            wd = wd * (d_tap != 0.0).astype(jnp.float32)
            acc_d = acc_d + d_tap * wd
            sum_d = sum_d + wd
        if hd_s is not None:
            ws = w_ * nm.compute_exponential_weight(angle, spec_nwp, 0.0)
            ws = ws * nm.compute_exponential_weight(rs * rs, ra, rb)
            s_tap = stencil.shifted(hd_s, dy, dx)
            ws = ws * (s_tap != 0.0).astype(jnp.float32)
            acc_s = acc_s + s_tap * ws
            sum_s = sum_s + ws

    out_d = out_s = None
    if diff is not None:
        new_hd = acc_d / jnp.maximum(sum_d, NRD_EPS)
        out_d = jnp.concatenate([diff[..., :-1], new_hd[..., None]], -1)
    if spec is not None:
        new_hs = acc_s / jnp.maximum(sum_s, NRD_EPS)
        out_s = jnp.concatenate([spec[..., :-1], new_hs[..., None]], -1)
    return out_d, out_s


# ---------------------------------------------------------------------------
# TemporalStabilization (REBLUR_TemporalStabilization.hlsli)
# ---------------------------------------------------------------------------


@jax.named_scope("REBLUR/temporal_stabilization")
def temporal_stabilization(sc, dc, view_z_in, normal_roughness, mv_in, data1_diff,
                           data1_spec, fbits, curvature, virtual_history_amount,
                           diff, spec, diff_luma_stab_history, spec_luma_stab_history,
                           spec_hitdist_for_tracking, base_color_metalness, config, *,
                           has_diffuse: bool, has_specular: bool, has_prepass: bool,
                           diff_sh=None, spec_sh=None, directional: bool = False,
                           pallas: bool = False, perf_mode=False, mesh=None):
    """Anti-lag output filter. Returns dict(diff, spec, diff_luma_stab, spec_luma_stab,
    data1_diff, data1_spec, mv_out[, diff_sh, spec_sh])."""
    h, w = view_z_in.shape
    uv = resample.pixel_uv_grid(h, w)
    view_z = unpack_view_z(sc, view_z_in)
    n, roughness, material_id = unpack_nr(sc, normal_roughness, config)

    v2w = jnp.asarray(sc["view_to_world"])
    xv = nm.reconstruct_view_position(uv, sc["frustum"][None, None, :], view_z,
                                      sc["ortho_mode"])
    x = xv @ v2w[:3, :3].T

    # surface motion (same as TA lines 50-70)
    mv = mv_in[..., :3] * sc["mv_scale"][None, None, :3]
    w2v_prev = jnp.asarray(sc["world_to_view_prev"])
    is_world_mv = sc["mv_scale"][3] != 0.0
    smb_uv_screen = uv + mv[..., :2]
    mv_z_computed = (x @ w2v_prev[:3, :3].T + w2v_prev[:3, 3])[..., 2] - view_z
    mv_z = jnp.where(sc["mv_scale"][2] == 0.0, mv_z_computed, mv[..., 2])
    view_z_prev = view_z + mv_z
    xv_prev_local = nm.reconstruct_view_position(
        smb_uv_screen, sc["frustum_prev"][None, None, :], view_z_prev, sc["ortho_mode"])
    x_prev_screen = xv_prev_local @ w2v_prev[:3, :3] + sc["camera_delta"][None, None, :]
    x_prev_world = x + mv
    smb_uv_world = nm.get_screen_uv(jnp.asarray(sc["world_to_clip_prev"]), x_prev_world)
    x_prev = jnp.where(is_world_mv, x_prev_world, x_prev_screen)
    smb_pixel_uv = jnp.where(is_world_mv, smb_uv_world, smb_uv_screen)

    rect_prev = sc["rect_size_prev"][None, None, :]
    smb_origin, smb_frac = nm.bilinear_filter(smb_pixel_uv, rect_prev)
    bits = fbits.astype(jnp.int32)
    smb_occ = jnp.stack([((bits >> b) & 1).astype(jnp.float32) for b in range(4)], -1)
    smb_weights = nm.get_bilinear_custom_weights(smb_frac, smb_occ)
    smb_allow_catrom = jnp.sum(smb_occ, -1) > 3.5
    bw = nm.bilinear_weights(smb_frac)
    smb_quality = jnp.sqrt(nm.saturate(jnp.sum(smb_occ * bw, -1)))

    out = {}
    mv_out = mv_in

    def stabilize_channel(signal, luma_stab_history, data1, occ_weights, allow_catrom,
                          quality, history_weight_extra, luma_is_last=False, occ4=None):
        luma = C.get_luma(signal, luma_is_last)
        if pallas:
            from ...kernels.reblur_pallas import (hist_sample_pallas,
                                                  moments_minmax_pallas)

            (m1, m2, lmin, lmax), = moments_minmax_pallas([luma], mesh=mesh)
            sigma = nm.get_std_dev(m1, m2)
            luma_rcrs = jnp.where(dc["max_blur_radius"] != 0.0,
                                  jnp.clip(luma, lmin, lmax), luma)
            smb_mvy, smb_mvx = uv_to_mv_pix(smb_pixel_uv, h, w, sc["rect_size_prev"])
            smb_hist = hist_sample_pallas(sc, [luma_stab_history], smb_mvy, smb_mvx,
                                          occ4, allow_catrom.astype(jnp.float32),
                                          use_catrom=not perf_mode, mesh=mesh)[0]
        else:
            m1 = jnp.zeros_like(luma)
            m2 = jnp.zeros_like(luma)
            lmin = jnp.full_like(luma, NRD_INF)
            lmax = jnp.full_like(luma, -NRD_INF)
            for dy, dx in stencil.offsets_square(1):
                t = stencil.shifted(luma, dy, dx)
                m1 = m1 + t
                m2 = m2 + t * t
                if not (dy == 0 and dx == 0):
                    lmin = jnp.minimum(lmin, t)
                    lmax = jnp.maximum(lmax, t)
            m1 = m1 / 9.0
            m2 = m2 / 9.0
            sigma = nm.get_std_dev(m1, m2)
            # RCRS (lines 131-135)
            luma_rcrs = jnp.where(dc["max_blur_radius"] != 0.0,
                                  jnp.clip(luma, lmin, lmax), luma)

            smb_hist = sample_history(luma_stab_history[..., None], smb_pixel_uv,
                                      sc["rect_size_prev"], occ_weights,
                                      allow_catrom)[..., 0]
        smb_hist = jnp.maximum(smb_hist, 0.0)
        antilag = C.compute_antilag(sc, dc, smb_hist, m1, sigma, quality * data1)
        taw, ta_sigma_scale = C.get_temporal_accumulation_params(sc, quality, data1)
        history_weight = taw * antilag
        history_weight = history_weight * (uv[..., 0] >= sc["split_screen"]).astype(
            jnp.float32)
        history_weight = history_weight * history_weight_extra
        hist_clamped = jnp.clip(smb_hist, m1 - sigma * ta_sigma_scale,
                                m1 + sigma * ta_sigma_scale)
        luma_stab = nm.lerp(luma_rcrs, hist_clamped,
                            jnp.minimum(history_weight, dc["stabilization_strength"]))
        return luma_stab, antilag, sigma, m1

    if has_diffuse:
        extra = (smb_pixel_uv[..., 0] >= sc["split_screen_prev"]).astype(jnp.float32)
        diff_luma_stab, diff_antilag, _, _ = stabilize_channel(
            diff, diff_luma_stab_history, data1_diff, smb_weights, smb_allow_catrom,
            smb_quality, extra, luma_is_last=directional, occ4=smb_occ)
        diff_out = C.change_luma(diff, diff_luma_stab, False, directional)
        out["diff"] = diff_out
        out["diff_luma_stab"] = diff_luma_stab
        if diff_sh is not None:
            scale = C.get_luma_scale(nm.length(diff_sh[..., :3]), diff_luma_stab)
            out["diff_sh"] = jnp.concatenate(
                [diff_sh[..., :3] * scale[..., None], diff_sh[..., 3:]], -1)
        d1 = data1_diff + 1.0
        dmin = jnp.minimum(d1, dc["history_fix_frame_num"])
        out["data1_diff"] = nm.lerp(dmin, d1, diff_antilag)

    if has_specular:
        # hit dist for tracking (lines 233-240)
        hdt = C.extract_hit_dist(spec) * fe.get_hit_distance_normalization(
            view_z, dc["hit_dist_params"][None, None, :], roughness)
        if has_prepass and spec_hitdist_for_tracking is not None:
            hdt = jnp.where(dc["spec_prepass_blur_radius"] != 0.0,
                            jnp.minimum(hdt, spec_hitdist_for_tracking), hdt)
        v = C.get_view_vector(sc, x)
        nov = jnp.abs(nm.dot(n, v))
        x_virtual = get_xvirtual(sc, hdt, curvature, x, x_prev, n, v, roughness)
        vmb_pixel_uv = nm.get_screen_uv(jnp.asarray(sc["world_to_clip_prev"]), x_virtual)
        is_cam_attached = material_id == sc["camera_attached_reflection_material_id"]
        vmb_pixel_uv = jnp.where(is_cam_attached[..., None], uv, vmb_pixel_uv)

        # MV patching (lines 250-285)
        if base_color_metalness is not None:
            base_color = base_color_metalness[..., :3]
            metalness = base_color_metalness[..., 3]
            albedo = base_color * (1.0 - metalness[..., None])
            rf0 = nm.lerp(jnp.full_like(base_color, 0.04), base_color,
                          metalness[..., None])
            fenv = fe.environment_term_rtg(rf0, nov, roughness)
            lum_spec = nm.luminance(fenv)
            lum_diff = nm.luminance(albedo * (1.0 - fenv))
            spec_prob = lum_spec / (lum_diff + lum_spec + NRD_EPS)
            f = nm.smoothstep(dc["spec_probability_thresholds"][0],
                              dc["spec_probability_thresholds"][1], spec_prob)
            f = f * (1.0 - nm.get_spec_magic_curve(roughness))
            f = f * (1.0 - jnp.sqrt(nm.saturate(jnp.abs(curvature))))

            spec_mv_xy = vmb_pixel_uv - uv
            spec_mv_z = (x_virtual @ w2v_prev[:3, :3].T + w2v_prev[:3, 3])[..., 2] - view_z
            new_mv_xy = spec_mv_xy / sc["mv_scale"][None, None, :2]
            new_mv_z = jnp.where(sc["mv_scale"][2] == 0.0, mv_in[..., 2],
                                 spec_mv_z / jnp.where(sc["mv_scale"][2] == 0.0, 1.0,
                                                       sc["mv_scale"][2]))
            patched = jnp.concatenate([new_mv_xy, new_mv_z[..., None]], -1)
            mv_out3 = nm.lerp(mv_in[..., :3], patched, f[..., None])
            if mv_in.shape[-1] == 3:
                mv_out = mv_out3
            else:
                mv_out = jnp.concatenate([mv_out3, mv_in[..., 3:]], -1)

        vmb_origin, vmb_frac = nm.bilinear_filter(vmb_pixel_uv, rect_prev)
        vmb_occ = jnp.stack([((bits >> b) & 1).astype(jnp.float32)
                             for b in range(4, 8)], -1)
        vmb_weights = nm.get_bilinear_custom_weights(vmb_frac, vmb_occ)
        vmb_allow_catrom = jnp.sum(vmb_occ, -1) > 3.5
        bwv = nm.bilinear_weights(vmb_frac)
        vmb_quality = jnp.sqrt(nm.saturate(jnp.sum(vmb_occ * bwv, -1)))

        # combine surface & virtual motion (lines 287-343)
        luma = C.get_luma(spec, False)
        if pallas:
            from ...kernels.reblur_pallas import (hist_sample_pallas,
                                                  moments_minmax_pallas)

            (m1, m2, lmin, lmax), = moments_minmax_pallas([luma], mesh=mesh)
            sigma = nm.get_std_dev(m1, m2)
            luma_rcrs = jnp.where(dc["max_blur_radius"] != 0.0,
                                  jnp.clip(luma, lmin, lmax), luma)
            smb_mvy, smb_mvx = uv_to_mv_pix(smb_pixel_uv, h, w, sc["rect_size_prev"])
            vmb_mvy, vmb_mvx = uv_to_mv_pix(vmb_pixel_uv, h, w, sc["rect_size_prev"])
            smb_hist = hist_sample_pallas(sc, [spec_luma_stab_history], smb_mvy,
                                          smb_mvx, smb_occ,
                                          smb_allow_catrom.astype(jnp.float32),
                                          use_catrom=not perf_mode, mesh=mesh)[0]
            vmb_hist = hist_sample_pallas(sc, [spec_luma_stab_history], vmb_mvy,
                                          vmb_mvx, vmb_occ,
                                          vmb_allow_catrom.astype(jnp.float32),
                                          use_catrom=not perf_mode, mesh=mesh)[0]
        else:
            m1 = jnp.zeros_like(luma)
            m2 = jnp.zeros_like(luma)
            lmin = jnp.full_like(luma, NRD_INF)
            lmax = jnp.full_like(luma, -NRD_INF)
            for dy, dx in stencil.offsets_square(1):
                t = stencil.shifted(luma, dy, dx)
                m1 = m1 + t
                m2 = m2 + t * t
                if not (dy == 0 and dx == 0):
                    lmin = jnp.minimum(lmin, t)
                    lmax = jnp.maximum(lmax, t)
            m1 = m1 / 9.0
            m2 = m2 / 9.0
            sigma = nm.get_std_dev(m1, m2)
            luma_rcrs = jnp.where(dc["max_blur_radius"] != 0.0,
                                  jnp.clip(luma, lmin, lmax), luma)

            smb_hist = sample_history(spec_luma_stab_history[..., None], smb_pixel_uv,
                                      sc["rect_size_prev"], smb_weights,
                                      smb_allow_catrom)[..., 0]
            vmb_hist = sample_history(spec_luma_stab_history[..., None], vmb_pixel_uv,
                                      sc["rect_size_prev"], vmb_weights,
                                      vmb_allow_catrom)[..., 0]
        smb_hist = jnp.maximum(smb_hist, 0.0)
        vmb_hist = jnp.maximum(vmb_hist, 0.0)
        spec_hist = nm.lerp(smb_hist, vmb_hist, virtual_history_amount)
        quality = nm.lerp(smb_quality, vmb_quality, virtual_history_amount)
        spec_antilag = C.compute_antilag(sc, dc, spec_hist, m1, sigma,
                                         quality * data1_spec)
        taw, ta_sigma_scale = C.get_temporal_accumulation_params(sc, quality, data1_spec)
        history_weight = taw * spec_antilag
        history_weight = history_weight * (uv[..., 0] >= sc["split_screen"]).astype(
            jnp.float32)
        smb_ok = (smb_pixel_uv[..., 0] >= sc["split_screen_prev"]).astype(jnp.float32)
        vmb_ok = (vmb_pixel_uv[..., 0] >= sc["split_screen_prev"]).astype(jnp.float32)
        history_weight = history_weight * jnp.where(virtual_history_amount != 1.0,
                                                    smb_ok, 1.0)
        history_weight = history_weight * jnp.where(virtual_history_amount != 0.0,
                                                    vmb_ok, 1.0)

        responsive_factor = C.remap_roughness_to_responsive_factor(dc, roughness)
        smc = nm.get_spec_magic_curve(roughness)
        acceleration = nm.lerp(smc, 1.0, 0.5 + responsive_factor * 0.5)
        history_weight = history_weight * jnp.where(
            material_id == sc["strand_material_id"], 0.5, acceleration)

        spec_hist = jnp.clip(spec_hist, m1 - sigma * ta_sigma_scale,
                             m1 + sigma * ta_sigma_scale)
        spec_luma_stab = nm.lerp(luma_rcrs, spec_hist,
                                 jnp.minimum(history_weight, dc["stabilization_strength"]))
        spec_out = C.change_luma(spec, spec_luma_stab, False)
        out["spec"] = spec_out
        out["spec_luma_stab"] = spec_luma_stab
        if spec_sh is not None:
            scale = C.get_luma_scale(nm.length(spec_sh[..., :3]), spec_luma_stab)
            out["spec_sh"] = jnp.concatenate(
                [spec_sh[..., :3] * scale[..., None], spec_sh[..., 3:]], -1)
        d1 = data1_spec + 1.0
        smin = jnp.minimum(d1, dc["history_fix_frame_num"])
        out["data1_spec"] = nm.lerp(smin, d1, spec_antilag)

    out["mv_out"] = mv_out
    return out

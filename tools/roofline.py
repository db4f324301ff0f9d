"""Roofline/MFU accounting for the stage-2 train step on the real chip.

Answers VERDICT r1 #2(d): is the step compute-bound at this chip's
envelope, and what fraction of the envelope does it achieve?

Method:
  - XLA-visible FLOPs from compiled.cost_analysis() (convs, matmuls,
    elementwise of the model/LPIPS/losses; does NOT see inside Pallas
    custom calls).
  - Pallas rasterizer FLOPs counted analytically: the kernel's group loop
    runs ceil(n_t/8)*8 entries per tile over P pixels; per (entry, pixel)
    pair _pair_math + aggregation is ~230 flops fwd / ~330 bwd (op count
    of raster_kernel._pair_math). Real per-image entry counts come from
    the actual binning of the benchmark scene.
  - Envelope: the tunneled chip's measured ~10 TFLOP/s matmul and the
    IN-KERNEL ~1.6 T vector-ops/s the rasterizer kernels sustain
    (BASELINE.md roofline section; round 1's 125 Gop/s number measured a
    bandwidth-bound standalone op and is superseded). The rasterizer is
    VPU work, so its roofline is the VPU number, NOT the MXU number.

  PYTHONPATH=/root/.axon_site:/root/repo python tools/roofline.py
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

FWD_FLOPS_PER_PAIR = 230.0   # _pair_math (~200) + softmax/alpha accum
BWD_FLOPS_PER_PAIR = 330.0   # _pair_math recompute + grad chains
MXU_ENVELOPE = 10e12         # measured matmul f32/bf16 ceiling (BASELINE.md)
# in-kernel sustained vector throughput of the rasterizer kernels
# (tools/kernel_split.py: 1.5-1.7 T ops/s; BASELINE.md roofline section)
VPU_ENVELOPE = 1.6e12


def count_render_pairs(fv, image_size, tile_size, sigma, dist_eps,
                       mf_cap, max_cover):
    """Entries-after-binning x pixels-per-tile for one render call."""
    from umr_tpu.ops.raster_kernel import GROUP, _compute_bins, _make_cfg

    cfg = _make_cfg(image_size, (0, 0, 0), 1.0, 100.0, 1e-3, sigma,
                    dist_eps, 1e-4, True, tile_size, 1, mf_cap)
    _fids, astarts = jax.jit(
        lambda f: _compute_bins(f, cfg, max_cover)
    )(fv)
    counts = np.asarray(astarts[:, 1:] - astarts[:, :-1])
    padded = ((counts + GROUP - 1) // GROUP) * GROUP
    return float(padded.sum()) * (tile_size * tile_size)


def main():
    from umr_tpu.config import Config
    from umr_tpu.data import synthetic_batch
    from umr_tpu.losses.composite import PartMatchingLoss
    from umr_tpu.mesh import build_template
    from umr_tpu.renderer import SoftRenderer
    from umr_tpu.training.steps import build_s2_step
    import bench

    BATCH, S = bench.BATCH, bench.IMAGE_SIZE
    cfg = Config(image_size=S, img_size=S, batch_size=BATCH,
                 num_hypo_cams=8, anti_aliasing=True, subdivide=3,
                 tex_size=6)
    template = build_template(cfg.subdivide, cfg.axis, cfg.tex_size)
    rng = np.random.RandomState(0)
    seg = rng.randint(0, 5, size=(128, 256)).astype(np.float32)
    V = template.num_verts
    idx = rng.permutation(V)
    pvi = [idx[0:100], idx[100:250], idx[250:330], idx[330:480]]
    part_renderer = SoftRenderer(
        image_size=S, anti_aliasing=cfg.anti_aliasing,
        ambient_intensity=1.0, directional_intensity=0.0)
    part_loss = PartMatchingLoss.build(
        seg, template.uv_sampler, template.num_sym_faces, part_renderer,
        tex_size=cfg.tex_size)
    model, disc, lpips, init_fn, step_fn = build_s2_step(
        cfg, template, part_loss, pvi)
    state = init_fn(jax.random.key(0))
    batch = jax.tree.map(jnp.asarray, synthetic_batch(rng, BATCH, S))
    key = jax.random.key(1)

    # ---- time the step --------------------------------------------------
    st, sc = step_fn(state, batch, key)
    float(jax.device_get(sc["total_loss"]))
    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        st, sc = step_fn(state, batch, jax.random.fold_in(key, i))
    float(jax.device_get(sc["total_loss"]))
    dt = (time.perf_counter() - t0) / iters

    # ---- XLA-visible FLOPs ----------------------------------------------
    lowered = jax.jit(step_fn).lower(state, batch, key)
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    xla_flops = float(ca.get("flops", 0.0))
    xla_bytes = float(ca.get("bytes accessed", 0.0))

    # ---- rasterizer pair counts for every render in the step -----------
    from umr_tpu.models.mesh_net import symmetrize
    variables = {"params": state.params["model"],
                 "batch_stats": state.batch_stats["model"],
                 "buffers": state.buffers, "template": state.template}
    out = model.apply(variables, batch["input_img"], train=False,
                      rngs={"sample": key})
    mean_shape = symmetrize(state.template["mean_v"], template)
    pred_vs = mean_shape[None] + symmetrize(out["delta_v"], template)
    cams_all = out["cam_hypotheses"]
    B, K = BATCH, cams_all.shape[1]
    rend = SoftRenderer(image_size=S, anti_aliasing=True)
    rsz = S * 2

    def pairs(vs, cams):
        fv = rend.project_faces(vs, jnp.asarray(template.faces), cams)
        return count_render_pairs(
            fv, rsz, rend.tile_size, rend.sigma_val, rend.dist_eps,
            rend.resolved_mf_cap(fv.shape[1]), rend.max_cover)

    vs_rep = jnp.repeat(pred_vs, K, 0)
    p_hypo = pairs(vs_rep, cams_all.reshape(B * K, 7))    # fused, fwd+bwd
    p_main = pairs(pred_vs, out["cam"])                   # hard + 2 parts
    from umr_tpu.ops.quaternion import rotate_cam
    angles = jax.random.randint(key, (B,), 0, 180)
    p_gan = pairs(pred_vs, rotate_cam(out["cam"], angles))  # fwd+bwd

    raster_flops = (
        p_hypo * (FWD_FLOPS_PER_PAIR + BWD_FLOPS_PER_PAIR)      # fused
        + p_main * FWD_FLOPS_PER_PAIR                            # hard fwd
        + 2 * p_main * (FWD_FLOPS_PER_PAIR + BWD_FLOPS_PER_PAIR)  # parts
        + p_gan * (FWD_FLOPS_PER_PAIR + BWD_FLOPS_PER_PAIR)      # GAN
    )

    total = xla_flops + raster_flops
    # the rasterizer runs on the VPU; everything XLA-visible is a mix, the
    # conv/matmul share dominates — report both bounds
    t_floor_vpu = raster_flops / VPU_ENVELOPE
    t_floor_mxu = xla_flops / MXU_ENVELOPE
    print(json.dumps({
        "step_time_s": round(dt, 4),
        "xla_flops_G": round(xla_flops / 1e9, 1),
        "xla_bytes_G": round(xla_bytes / 1e9, 2),
        "raster_flops_G": round(raster_flops / 1e9, 1),
        "raster_pairs_G": round((p_hypo * 2 + p_main * 3 + p_gan * 2) / 1e9,
                                2),
        "flops_total_G": round(total / 1e9, 1),
        "mfu_vs_mixed_envelope": round(
            (xla_flops / MXU_ENVELOPE + raster_flops / VPU_ENVELOPE) / dt, 3
        ),
        "time_floor_s_raster_at_vpu_envelope": round(t_floor_vpu, 3),
        "time_floor_s_xla_at_mxu_envelope": round(t_floor_mxu, 3),
        "images_per_sec": round(BATCH / dt, 2),
    }))


if __name__ == "__main__":
    main()

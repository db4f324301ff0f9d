"""End-to-end capability proof on the synthetic bird category.

Runs the REAL curriculum — train_s1 (with online template updates) ->
avg_uv -> train_s2 -> test_iou + test_kp — on a rendered dataset with
known ground truth (umr_tpu/data/synthetic_category.py), train/test
split, on the real TPU chip. This converts the per-component test suite
into one compositional proof that the pipeline actually LEARNS a
single-view reconstructor (VERDICT r2 missing #1; the reference's bar is
README.md:54-96 + experiments/test_iou.py:104-115).

Success bar (recorded in BASELINE.md):
  - held-out mask IoU well above the area-prior baseline (mean GT mask
    coverage) and >= ~0.7;
  - kp-transfer PCK (flow and cam modes) clearly above the
    identity-transfer baseline (predicting the source location
    unchanged) on the same deterministic pairs.

  PYTHONPATH=/root/.axon_site:/root/repo python tools/synthetic_parity.py \
      --out cachedir/synparity --train_n 384 --test_n 64 \
      --s1_iters 600 --s2_iters 1500

Re-runs resume: the dataset is cached as npz, each training stage
auto-resumes from its Orbax state, and completed stages are skipped.
"""

import argparse
import json
import os
import os.path as osp
import time

import numpy as np


def get_or_make_dataset(path, template, n, seed, image_size):
    if osp.exists(path):
        d = dict(np.load(path))
        if d["img"].shape[0] == n:
            return d
        print(f"cached {path} has {d['img'].shape[0]} != {n}; regenerating")
    from umr_tpu.data.synthetic_category import generate_dataset

    t0 = time.perf_counter()
    d = generate_dataset(template, n, seed=seed, image_size=image_size)
    np.savez_compressed(path, **d)
    print(f"generated {n} samples -> {path} "
          f"({time.perf_counter() - t0:.0f}s)")
    return d


def identity_pck(pairs_kp, padding_frac=0.05):
    """PCK of the identity transfer (predict the source location
    unchanged) over [N,2,K,3] pair keypoints — the chance baseline."""
    scale = (1 + 2 * padding_frac) / 2.0
    errs, vis = [], []
    for kp in pairs_kp:
        vis.append((kp[0, :, 2] * kp[1, :, 2])[None].repeat(2, 0))
        e = np.stack([kp[1, :, :2] - kp[0, :, :2],
                      kp[0, :, :2] - kp[1, :, :2]])
        errs.append(np.sqrt((e ** 2).sum(-1)) * scale)
    errs = np.concatenate(errs)
    vis = np.concatenate(vis)
    nv = vis.sum(0)
    return (
        float((((errs < 0.1) * vis).sum(0) / nv).mean()),
        float((((errs < 0.15) * vis).sum(0) / nv).mean()),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="cachedir/synparity")
    ap.add_argument("--train_n", type=int, default=384)
    ap.add_argument("--test_n", type=int, default=64)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--s1_iters", type=int, default=600)
    ap.add_argument("--s2_iters", type=int, default=1500)
    ap.add_argument("--n_pairs", type=int, default=200)
    ap.add_argument("--display_freq", type=int, default=200,
                    help="training-visuals cadence; <=0 disables visuals "
                    "entirely. The first dump pays a multi-minute remote "
                    "compile of the batch-4 vis render graphs, so "
                    "time-boxed runs may want 0 or very large")
    ap.add_argument("--save_freq", type=int, default=200,
                    help="save_latest_freq for the training stages; each "
                    "save device_gets ~370 MB of params through the "
                    "tunnel, so time-boxed runs may want this larger")
    ap.add_argument("--skip_train", action="store_true",
                    help="evaluate existing checkpoints only")
    ap.add_argument("--s2_set", action="append", default=[], metavar="K=V",
                    help="stage-2 Config override (repeatable), e.g. "
                    "cycle_soft_p2f=True; parsed as JSON, falls back to "
                    "string")
    args = ap.parse_args()

    s2_overrides = {}
    for kv in args.s2_set:
        k, v = kv.split("=", 1)
        try:
            s2_overrides[k] = json.loads(
                v.lower() if v in ("True", "False") else v)
        except json.JSONDecodeError:
            s2_overrides[k] = v

    import jax

    from umr_tpu.config import Config
    from umr_tpu.data.synthetic_category import CategoryLoader, PairLoader
    from umr_tpu.mesh import build_template

    out = osp.abspath(args.out)
    os.makedirs(out, exist_ok=True)
    S = args.image_size
    template = build_template(3, 1, 6)

    train = get_or_make_dataset(
        osp.join(out, "train.npz"), template, args.train_n, 0, S)
    test = get_or_make_dataset(
        osp.join(out, "test.npz"), template, args.test_n, 1, S)
    print(f"mask coverage: train {train['mask'].mean():.3f} "
          f"test {test['mask'].mean():.3f}")

    common = dict(
        image_size=S, img_size=S, batch_size=args.batch,
        checkpoint_dir=osp.join(out, "snap"),
        vis_dir=osp.join(out, "vis"),
        results_vis_dir=osp.join(out, "rvis"),
        num_epochs=100000, save_latest_freq=args.save_freq,
        save_epoch_freq=100000,
        print_freq=20, display_freq=args.display_freq,
        stemp_path=osp.join(out, "stemp"),
    )
    summary = {"train_n": args.train_n, "test_n": args.test_n,
               "image_size": S}

    def save_summary():
        """Stage-wise durability (VERDICT r3 #7): a killed run leaves a
        partial summary rather than losing the round's artifact."""
        with open(osp.join(out, "summary.json"), "w") as f:
            json.dump(summary, f, indent=1)

    save_summary()

    # ---- stage 1 + avg_uv, with a dead-template retry ---------------------
    # A weak s1 texture flow (UV pixels all sampling near the image
    # center) collapses the averaged UV part map — the root cause of the
    # round-3/4 template collapses, isolated by the oracle-flow test
    # (tests/test_avg_uv_oracle.py: machinery clean under a GT flow; a
    # center-collapsed flow reproduces the dead template exactly). Two
    # gates defend the handoff:
    #   1. flow health BEFORE avg_uv: the uv_flow_area scalar (fraction
    #      of a 16x16 image grid the flow samples) must clear
    #      FLOW_AREA_BAR, else extend s1 first — this skips the
    #      expensive avg_uv pass entirely when s1 is obviously unready;
    #   2. the template liveliness bar AFTER avg_uv: all 4 parts >=
    #      part_min_vert_frac of verts (the documented BASELINE bar).
    from umr_tpu.experiments import avg_uv, train_s1

    FLOW_AREA_BAR = 0.10  # oracle flow ~0.2-0.4; collapsed flow <0.02

    def last_scalar_median(log_path, key, k=20):
        import re

        vals = []
        if osp.exists(log_path):
            with open(log_path) as f:
                for line in f:
                    m = re.search(rf"{key}: ([0-9.eE+-]+)", line)
                    if m:
                        vals.append(float(m.group(1)))
        return float(np.median(vals[-k:])) if vals else None

    s1_pth = osp.join(out, "snap", "s1", "pred_net_latest.pth")
    s1_log = osp.join(out, "snap", "s1", "loss_log.txt")
    stemp = osp.join(out, "stemp")
    summary["s1_wall_s"] = summary["avg_uv_wall_s"] = 0.0
    template_ok = False
    min_cnt = max(1, int(np.ceil(0.02 * template.num_verts)))
    max_attempts = 4
    for attempt in range(max_attempts):
        s1_iters = args.s1_iters * (attempt + 1)
        cfg1 = Config(**common, name="s1", use_scops=False,
                      mask_loss_wt=3.0, flatten_reg_wt=0.0004,
                      deform_reg_wt=5.0, tex_cycle_loss_wt=0.5,
                      num_iter=s1_iters)
        t0 = time.perf_counter()
        if not args.skip_train:
            loader1 = CategoryLoader(train, args.batch, seed=10,
                                     use_scops=False, device_data=True)
            train_s1.run(cfg1, dataloader=loader1)
        summary["s1_wall_s"] += round(time.perf_counter() - t0, 1)
        assert osp.exists(s1_pth), s1_pth
        flow_area = last_scalar_median(s1_log, "uv_flow_area")
        summary["s1_uv_flow_area"] = flow_area
        summary["s1_iters_used"] = s1_iters
        save_summary()
        if (not args.skip_train and flow_area is not None
                and flow_area < FLOW_AREA_BAR
                and attempt < max_attempts - 1):
            print(f"s1 flow health {flow_area:.3f} < {FLOW_AREA_BAR}; "
                  f"extending s1 to {args.s1_iters * (attempt + 2)} "
                  "iters before paying for avg_uv")
            continue

        cfg_uv = Config(**common, name="uv", use_scops=True,
                        model_path=s1_pth, out_dir=stemp)
        t0 = time.perf_counter()
        if not (args.skip_train and osp.exists(osp.join(
                stemp, "semantic_seg.png"))):
            loader_uv = CategoryLoader(train, args.batch, shuffle=False,
                                       use_scops=True, device_data=True)
            avg_uv.run(cfg_uv, dataloader=loader_uv)
        summary["avg_uv_wall_s"] += round(time.perf_counter() - t0, 1)
        # the semantic-consistency losses are only live if every part
        # clears the liveliness bar (round-3/4 post-mortems: collapsed
        # templates silently zeroed corr_loss for entire s2 runs)
        summary["part_vertex_counts"] = {
            p: int(np.load(osp.join(stemp, f"{p}_vertices.npy")).size)
            for p in ("head", "neck", "back", "belly")
        }
        save_summary()
        pvc = summary["part_vertex_counts"]
        template_ok = all(c >= min_cnt for c in pvc.values())
        summary["template_ok"] = template_ok
        save_summary()
        if template_ok or args.skip_train:
            break
        print(f"dead semantic template {pvc} (bar: all >= {min_cnt}); "
              f"extending s1 to {args.s1_iters * (attempt + 2)} iters "
              "and retrying avg_uv")

    if not (template_ok or args.skip_train):
        # record the failure honestly and stop: training s2 on a dead
        # template wastes the round (train_s2 would refuse it anyway
        # without --force_template)
        summary["failed"] = "semantic template never cleared the bar"
        save_summary()
        print(json.dumps(summary))
        raise SystemExit(
            f"ABORT: {summary['failed']} after {max_attempts} attempts "
            f"({summary.get('part_vertex_counts')})")

    # ---- stage 2 ---------------------------------------------------------
    from umr_tpu.experiments import train_s2

    # NOTE: the reference's stage 2 does NOT load the stage-1 network —
    # it trains fresh (ImageNet trunk) and takes only mean_v from the
    # semantic template (ref cub_mesh.py:393-396; train_s2.py has no
    # model-loading call). train_s2.run already installs mean_v from
    # stemp_path; the s1 .pth must not be force-loaded (the s1/s2 shape
    # heads differ: s1's MLP head vs s2's 337*3 delta head).
    cfg2 = Config(**common, name="s2", use_scops=True,
                  num_iter=args.s2_iters, **s2_overrides)
    summary["s2_overrides"] = s2_overrides
    s2_pth = osp.join(out, "snap", "s2", "pred_net_latest.pth")
    t0 = time.perf_counter()
    if not args.skip_train:
        loader2 = CategoryLoader(train, args.batch, seed=20,
                                 use_scops=True, device_data=True)
        train_s2.run(cfg2, dataloader=loader2)
    summary["s2_wall_s"] = round(time.perf_counter() - t0, 1)
    assert osp.exists(s2_pth), s2_pth
    # semantic-consistency liveliness: median corr_loss over the last 20
    # logged steps must be nonzero for the curriculum to have exercised
    # its titular objective (ref loss_utils.py:194-248)
    corr_vals = []
    log_path = osp.join(out, "snap", "s2", "loss_log.txt")
    if osp.exists(log_path):
        import re

        with open(log_path) as f:
            for line in f:
                m = re.search(r"corr_loss: ([0-9.eE+-]+)", line)
                if m:
                    corr_vals.append(float(m.group(1)))
    if corr_vals:
        summary["s2_corr_loss_last20_median"] = round(
            float(np.median(corr_vals[-20:])), 4)
        summary["s2_corr_loss_live"] = bool(
            np.median(corr_vals[-20:]) > 0.0)
    save_summary()

    # ---- eval: held-out mask IoU ----------------------------------------
    from umr_tpu.experiments import test_iou

    cfg_iou = Config(**common, name="iou", use_scops=False,
                     model_path=s2_pth, split="test")
    test_loader = CategoryLoader(test, args.batch, shuffle=False,
                                 use_scops=False, drop_last=False)
    iou = test_iou.run(cfg_iou, dataloader=test_loader)
    # baseline: predicting the mean GT mask area everywhere scores the
    # area prior; any real reconstructor must beat it by a wide margin
    summary["test_iou"] = round(float(iou), 4)
    summary["iou_area_prior"] = round(float(test["mask"].mean()), 4)
    save_summary()

    # ---- eval: kp transfer ----------------------------------------------
    from umr_tpu.experiments import test_kp
    from umr_tpu.data.synthetic_category import make_pair_orders

    o1, o2 = make_pair_orders(test["img"].shape[0], args.n_pairs, seed=303)
    pairs_kp = [
        np.stack([test["kp"][i], test["kp"][j]]) for i, j in zip(o1, o2)
    ]
    id1, id15 = identity_pck(pairs_kp)
    summary["pck_identity_0.1"] = round(id1, 4)
    summary["pck_identity_0.15"] = round(id15, 4)
    for mode in ("flow", "cam"):
        cfg_kp = Config(**common, name=f"kp_{mode}", use_scops=False,
                        model_path=s2_pth, split="test", mode=mode,
                        number_pairs=args.n_pairs)
        t0 = time.perf_counter()
        pck1, pck15 = test_kp.run(
            cfg_kp,
            loaders=(PairLoader(test, o1), PairLoader(test, o2)),
        )
        summary[f"pck_{mode}_0.1"] = round(pck1, 4)
        summary[f"pck_{mode}_0.15"] = round(pck15, 4)
        summary[f"kp_{mode}_wall_s"] = round(time.perf_counter() - t0, 1)
        save_summary()

    summary["iou_ok"] = bool(summary["test_iou"] >= 0.7)
    summary["pck_ok"] = bool(
        summary["pck_flow_0.1"] > id1 or summary["pck_cam_0.1"] > id1
    )
    print(json.dumps(summary))
    save_summary()


if __name__ == "__main__":
    main()

"""Extend a completed synthetic-parity stage-2 run and re-evaluate.

Round-5 follow-up on the passing capability run (BASELINE.md): cam-mode
PCK cleared its bar but flow-mode PCK (the reference's headline
transfer mode, ref experiments/test_kp.py:125-158) came out below the
synthetic identity baseline at 2500 s2 iters (~16 synthetic epochs vs
the reference's 200 CUB epochs). This tool answers whether flow PCK is
*convergence-limited* (rises with more s2 iters) or *data-limited*
(plateaus): it copies `snap/s2` + `stemp` out of a completed
`tools/synthetic_parity.py` run dir, resumes train_s2 via the trainer's
Orbax auto-resume up to --s2_iters, and re-runs the IoU + kp-transfer
evals, writing its own summary.json. The source run dir is never
modified.

  PYTHONPATH=/root/.axon_site:/root/repo python tools/extend_s2.py \
      --src cachedir/synparity_r6 --out cachedir/synparity_r6_ext \
      --s2_iters 5000

`--fresh` instead trains s2 FROM SCRATCH off the source run's semantic
template (the reference's s2 never loads the s1 net, only mean_v — ref
cub_mesh.py:393-396), and `--set key=value` overrides Config fields —
together they run controlled s2 ablations against the same s1/avg_uv
artifacts, e.g. the cycle_soft_p2f experiment:

  ... tools/extend_s2.py --src cachedir/synparity_r6 \
      --out cachedir/synparity_r6_softp2f --fresh \
      --set cycle_soft_p2f=True --s2_iters 2500
"""

import argparse
import json
import os
import os.path as osp
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
from synthetic_parity import identity_pck  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="cachedir/synparity_r6")
    ap.add_argument("--out", default="cachedir/synparity_r6_ext")
    ap.add_argument("--s2_iters", type=int, default=5000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n_pairs", type=int, default=200)
    ap.add_argument("--save_freq", type=int, default=500)
    ap.add_argument("--fresh", action="store_true",
                    help="train s2 from scratch off the source run's "
                    "semantic template instead of resuming its s2 state")
    ap.add_argument("--set", action="append", default=[], metavar="K=V",
                    help="Config override (repeatable), e.g. "
                    "cycle_soft_p2f=True")
    args = ap.parse_args()

    overrides = {}
    for kv in args.set:
        k, v = kv.split("=", 1)
        try:
            overrides[k] = json.loads(v.lower() if v in ("True", "False")
                                      else v)
        except json.JSONDecodeError:
            overrides[k] = v

    src, out = osp.abspath(args.src), osp.abspath(args.out)
    os.makedirs(osp.join(out, "snap"), exist_ok=True)
    subs = (("stemp",),) if args.fresh else (("snap", "s2"), ("stemp",))
    for sub in subs:
        dst = osp.join(out, *sub)
        if not osp.isdir(dst):
            shutil.copytree(osp.join(src, *sub), dst)

    from umr_tpu.config import Config
    from umr_tpu.data.synthetic_category import (
        CategoryLoader, PairLoader, make_pair_orders)
    from umr_tpu.experiments import test_iou, test_kp, train_s2

    train = dict(np.load(osp.join(src, "train.npz")))
    test = dict(np.load(osp.join(src, "test.npz")))
    S = int(train["img"].shape[1])

    common = dict(
        image_size=S, img_size=S, batch_size=args.batch,
        checkpoint_dir=osp.join(out, "snap"),
        vis_dir=osp.join(out, "vis"),
        results_vis_dir=osp.join(out, "rvis"),
        num_epochs=100000, save_latest_freq=args.save_freq,
        save_epoch_freq=100000, print_freq=20, display_freq=0,
        stemp_path=osp.join(out, "stemp"),
    )
    summary = {"src": src, "s2_iters": args.s2_iters,
               "fresh": args.fresh, "overrides": overrides}

    def save_summary():
        with open(osp.join(out, "summary.json"), "w") as f:
            json.dump(summary, f, indent=1)

    # ---- resume stage 2 to the extended iteration count ------------------
    cfg2 = Config(**common, name="s2", use_scops=True,
                  num_iter=args.s2_iters, **overrides)
    s2_pth = osp.join(out, "snap", "s2", "pred_net_latest.pth")
    t0 = time.perf_counter()
    loader2 = CategoryLoader(train, args.batch, seed=20,
                             use_scops=True, device_data=True)
    train_s2.run(cfg2, dataloader=loader2)
    summary["s2_ext_wall_s"] = round(time.perf_counter() - t0, 1)
    assert osp.exists(s2_pth), s2_pth
    save_summary()

    # ---- evals (identical protocol to synthetic_parity) ------------------
    cfg_iou = Config(**common, name="iou", use_scops=False,
                     model_path=s2_pth, split="test")
    test_loader = CategoryLoader(test, args.batch, shuffle=False,
                                 use_scops=False, drop_last=False)
    summary["test_iou"] = round(float(test_iou.run(
        cfg_iou, dataloader=test_loader)), 4)
    save_summary()

    o1, o2 = make_pair_orders(test["img"].shape[0], args.n_pairs,
                              seed=303)
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
        pck1, pck15 = test_kp.run(
            cfg_kp, loaders=(PairLoader(test, o1), PairLoader(test, o2)))
        summary[f"pck_{mode}_0.1"] = round(pck1, 4)
        summary[f"pck_{mode}_0.15"] = round(pck15, 4)
        save_summary()

    print(json.dumps(summary))
    save_summary()


if __name__ == "__main__":
    main()

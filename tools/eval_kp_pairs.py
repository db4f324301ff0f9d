"""Keypoint-transfer PCK on viewpoint-separated pairs.

The synthetic category's uniformly-sampled test pairs inflate the
identity-transfer baseline (BASELINE.md: identity PCK@0.1 0.446 vs
~0.25 typical on CUB) because many pairs share near-canonical keypoint
layouts — identity is then a strong predictor and "beat identity" is a
harder bar than the reference ever faces. This tool re-evaluates a
finished run's checkpoint on pairs whose GROUND-TRUTH cameras differ by
at least --min_angle_deg of rotation (the synthetic npz stores GT
7-vector cams), where the identity transfer actually has to be wrong.
Protocol is otherwise identical to tools/synthetic_parity.py (same
test_kp.run, ref experiments/test_kp.py:125-158 flow mode /
:160-206 cam mode; same PCK scaling).

  PYTHONPATH=/root/.axon_site:/root/repo python tools/eval_kp_pairs.py \
      --run cachedir/synparity_r6 --min_angle_deg 30
"""

import argparse
import json
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
from synthetic_parity import identity_pck  # noqa: E402


def quat_angle_deg(q1, q2):
    """Relative rotation angle between unit quaternions, degrees."""
    d = np.abs((q1 * q2).sum(-1)).clip(0.0, 1.0)
    return np.degrees(2.0 * np.arccos(d))


def hard_pair_orders(cams, n_pairs, min_angle_deg, seed=303):
    """Deterministic pairs with GT relative rotation >= min_angle_deg.
    Same with-replacement/self-pair-free semantics as make_pair_orders,
    restricted to the angle-qualified candidate set."""
    n = cams.shape[0]
    q = cams[:, 3:7] / np.linalg.norm(cams[:, 3:7], axis=-1, keepdims=True)
    ang = quat_angle_deg(q[:, None, :], q[None, :, :])
    i, j = np.where((ang >= min_angle_deg) & ~np.eye(n, dtype=bool))
    if i.size == 0:
        raise SystemExit(
            f"no pairs with relative rotation >= {min_angle_deg} deg "
            f"(max available: {ang[~np.eye(n, dtype=bool)].max():.1f})")
    rng = np.random.RandomState(seed)
    pick = rng.randint(0, i.size, size=n_pairs)
    return i[pick], j[pick], float(ang[i[pick], j[pick]].mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="cachedir/synparity_r6",
                    help="finished synthetic_parity/extend_s2 run dir")
    ap.add_argument("--min_angle_deg", type=float, default=30.0)
    ap.add_argument("--n_pairs", type=int, default=200)
    ap.add_argument("--modes", default="flow,cam")
    args = ap.parse_args()

    run = osp.abspath(args.run)
    test = dict(np.load(osp.join(run, "test.npz")))

    from umr_tpu.config import Config
    from umr_tpu.data.synthetic_category import PairLoader
    from umr_tpu.experiments import test_kp

    o1, o2, mean_ang = hard_pair_orders(
        test["cam"], args.n_pairs, args.min_angle_deg)
    pairs_kp = [
        np.stack([test["kp"][i], test["kp"][j]]) for i, j in zip(o1, o2)
    ]
    id1, id15 = identity_pck(pairs_kp)
    out = {
        "run": run, "min_angle_deg": args.min_angle_deg,
        "n_pairs": args.n_pairs, "mean_pair_angle_deg": round(mean_ang, 1),
        "pck_identity_0.1": round(id1, 4),
        "pck_identity_0.15": round(id15, 4),
    }

    S = int(test["img"].shape[1])
    s2_pth = osp.join(run, "snap", "s2", "pred_net_latest.pth")
    common = dict(
        image_size=S, img_size=S, batch_size=16,
        checkpoint_dir=osp.join(run, "snap"),
        stemp_path=osp.join(run, "stemp"),
        model_path=s2_pth, split="test", number_pairs=args.n_pairs,
    )
    for mode in args.modes.split(","):
        cfg = Config(**common, name=f"kp_hard_{mode}", mode=mode)
        pck1, pck15 = test_kp.run(
            cfg, loaders=(PairLoader(test, o1), PairLoader(test, o2)))
        out[f"pck_{mode}_0.1"] = round(pck1, 4)
        out[f"pck_{mode}_0.15"] = round(pck15, 4)

    path = osp.join(run, f"kp_hard_{int(args.min_angle_deg)}deg.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

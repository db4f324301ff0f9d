"""Training harness: epoch loop, device transfer, logging, checkpoints.

Mirrors the reference Trainer template (ref: nnutils/train_utils.py:86-259):
same cadences (print_freq, save_latest_freq, save_epoch_freq, display_freq),
same scalar names (including iter_time), same checkpoint naming. The
per-batch host work is only normalization + device_put — the EDT barrier is
computed in loader workers, rotate_cam/part normalization run on device.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..parallel import make_mesh, replicate, shard_batch
from ..utils.visualizer import Visualizer, green
from . import checkpoints

RESNET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
RESNET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def prepare_batch(batch, use_scops=True, use_texture=True):
    """Host batch dict -> device-ready dict (ref set_input,
    train_s2.py:166-199)."""
    imgs = batch["img"].astype(np.float32)
    out = {
        "img": imgs,
        "input_img": (imgs - RESNET_MEAN) / RESNET_STD,
        "mask": batch["mask"].astype(np.float32),
        "real_imgs": imgs * batch["mask"][..., None].astype(np.float32),
    }
    if use_texture and "dts_barrier" in batch:
        out["dts_barrier"] = batch["dts_barrier"].astype(np.float32)
    if use_scops and "part_prob" in batch:
        out["part_prob"] = batch["part_prob"].astype(np.float32)
        for k in ("head_points", "belly_points", "neck_points",
                  "back_points"):
            out[k] = batch[k].astype(np.float32)
    return out


class Trainer:
    """Generic epoch loop shared by the s1/s2 entry points."""

    def __init__(self, cfg: Config, step_fn, state, dataloader,
                 extra_step_args=None, on_epoch_end=None,
                 visuals_fn=None):
        self.cfg = cfg
        self.step_fn = step_fn
        self.state = state
        self.dataloader = dataloader
        self.extra_step_args = extra_step_args or (lambda epoch: ())
        self.on_epoch_end = on_epoch_end
        self.visuals_fn = visuals_fn
        self.vis_out = os.path.join(cfg.vis_dir, cfg.name)
        self.save_dir = os.path.join(cfg.checkpoint_dir, cfg.name)
        os.makedirs(self.save_dir, exist_ok=True)
        self._dump_opts()
        self._maybe_auto_resume()
        self.mesh = make_mesh() if cfg.data_parallel else None
        if self.mesh is not None:
            self.state = replicate(self.state, self.mesh)
        # GAN "real" images lag one batch behind, like the reference's
        # random_imgs buffer (initialized from the first batch, then
        # refreshed at the END of each forward — ref: train_s2.py:183-184,
        # 270). None until the first batch arrives.
        self._lagged_real = None
        # Per-stage wall budget (VERDICT r4 #5): where each step-cycle
        # second goes — loader wait, host prep, device transfer/shard,
        # step dispatch, scalar drain (device sync), visuals, saves.
        # Written to {save_dir}/stage_budget.json at every save and at
        # the end of training; first_cycle_s isolates compile cost.
        self._budget = {k: 0.0 for k in (
            "loader", "prep", "transfer", "dispatch", "drain", "vis",
            "save")}
        self._budget_n = 0
        self._first_cycle_s = None

    def _maybe_auto_resume(self):
        """Restore the latest Orbax training state when one exists.

        Gives preemption recovery the reference lacks: step count, params,
        optimizer state and template all come back. The .pth import path
        (UMR_TPU_RESUME, handled by the entry points before Trainer
        construction) is an explicit override — when set, the Orbax state
        is ignored. Disable entirely with UMR_TPU_NO_AUTORESUME=1."""
        if os.environ.get("UMR_TPU_NO_AUTORESUME") or \
                os.environ.get("UMR_TPU_RESUME"):
            return
        path = os.path.join(self.save_dir, "pred_state")
        if not os.path.isdir(path):
            return
        try:
            self.state = checkpoints.restore_state(
                self.save_dir, "pred", self.state
            )
            step = int(jax.device_get(self.state.step))
            print(green(f"Auto-resumed from {path} at step {step}."))
        except Exception as e:  # structure drift: start fresh, loudly
            print(f"Auto-resume from {path} failed ({e}); starting fresh.")

    def _dump_opts(self):
        with open(os.path.join(self.save_dir, "opts.log"), "w") as f:
            for k, v in sorted(vars(self.cfg).items()):
                f.write(f"{k}: {v}\n")

    def save(self, label, export_pth=True):
        """Orbax state (resume) + optionally the reference-format .pth.

        export_pth=False on mid-run cadence saves: the .pth is only
        consumed at stage handoffs (avg_uv/train_s2/eval), and exporting
        it device_gets ~370 MB of reference-parity params through the
        tunnel on top of Orbax's ~1.1 GB (params + Adam moments) — the
        round-5 stage budget measured ~111 s per full save."""
        t0 = time.perf_counter()
        checkpoints.save_state(self.save_dir, "pred", self.state)
        if export_pth:
            tp = getattr(self.state, "trunk_pretrained", None)
            bs = getattr(self.state, "batch_stats", None) or {}
            checkpoints.save_pth(
                os.path.join(self.save_dir, f"pred_net_{label}.pth"),
                jax.device_get(self.state.params["model"]),
                jax.device_get(self.state.template),
                meta=None if tp is None else {
                    "trunk_pretrained": jax.device_get(tp)
                },
                batch_stats=jax.device_get(bs.get("model")) if bs else None,
            )
        self._budget["save"] += time.perf_counter() - t0
        self._dump_budget()

    def _dump_budget(self):
        if not self._budget_n:
            return
        import json

        n = self._budget_n
        out = {f"{k}_s_per_step": round(v / n, 4)
               for k, v in self._budget.items()}
        out["steps"] = n
        out["total_s_per_step"] = round(
            sum(self._budget.values()) / n, 4)
        if self._first_cycle_s is not None:
            out["first_cycle_s"] = round(self._first_cycle_s, 1)
        with open(os.path.join(self.save_dir, "stage_budget.json"),
                  "w") as f:
            json.dump(out, f, indent=1)
        print("stage budget:", json.dumps(out))

    def train(self):
        cfg = self.cfg
        visualizer = Visualizer(cfg)
        rng = jax.random.key(cfg.seed)
        total_steps = int(jax.device_get(self.state.step))  # 0 or resumed
        dispatched = total_steps
        smoothed = 0.0
        self._pending = None  # (scalars, start, epoch, epoch_iter, batch)
        if cfg.num_iter and total_steps >= cfg.num_iter:
            # auto-resumed at/past the target: the run is already done —
            # don't train through num_epochs and overwrite the finished
            # checkpoint
            print(green(
                f"Run already complete at step {total_steps} "
                f"(num_iter={cfg.num_iter}); nothing to do."
            ))
            return self.state

        # Resume into the RIGHT epoch: the restored step says how many
        # batches already ran, so skip the completed epochs instead of
        # re-training the full range (which would over-train and stretch
        # the lr-decay horizon), and advance the loader's epoch counter so
        # the shuffle orders aren't replayed from epoch 0.
        done_epochs = 0
        try:
            spe = len(self.dataloader)
            if spe > 0:
                done_epochs = total_steps // spe
        except TypeError:
            pass  # sized loaders only; unsized ones restart at epoch 0
        if done_epochs and hasattr(self.dataloader, "_epoch"):
            self.dataloader._epoch = done_epochs

        loop_start = t_mark = time.perf_counter()
        for epoch in range(cfg.num_pretrain_epochs + done_epochs,
                           cfg.num_epochs):
            epoch_iter = 0
            for batch in self.dataloader:
                t0 = time.perf_counter()
                self._budget["loader"] += t0 - t_mark
                rng, step_key = jax.random.split(rng)
                db = prepare_batch(batch, cfg.use_scops, cfg.use_texture)
                # one-batch-lag GAN reals (ref: train_s2.py:183-184,270);
                # the lag only applies while batch shapes are stable (a
                # trailing partial batch would retrigger compilation)
                cur_real = db["real_imgs"]
                if (self._lagged_real is not None
                        and self._lagged_real.shape == cur_real.shape):
                    db["real_imgs"] = self._lagged_real
                self._lagged_real = cur_real
                t1 = time.perf_counter()
                self._budget["prep"] += t1 - t0
                if self.mesh is not None:
                    db = shard_batch(db, self.mesh)
                else:
                    db = jax.tree.map(jnp.asarray, db)
                t2 = time.perf_counter()
                self._budget["transfer"] += t2 - t1

                start = time.time()
                self.state, scalars = self.step_fn(
                    self.state, db, step_key, *self.extra_step_args(epoch)
                )
                self._budget["dispatch"] += time.perf_counter() - t2
                dispatched += 1
                # One-step-lagged scalar drain: reading total_loss here
                # would force the step to COMPLETE before the next host
                # batch prep starts, serializing host prep + transfer
                # with device compute. Draining the PREVIOUS step's
                # scalars after this step is enqueued lets XLA overlap
                # them — the logged values are identical, one step late.
                total_steps, smoothed = self._drain(
                    total_steps, smoothed, visualizer)
                self._pending = (scalars, start, epoch, epoch_iter, db)
                epoch_iter += 1
                self._budget_n += 1
                if self._budget_n == 2 and self._first_cycle_s is None:
                    # first two cycles ~= compile + warmup cost
                    self._first_cycle_s = time.perf_counter() - loop_start
                t_mark = time.perf_counter()

                if cfg.num_iter and dispatched >= cfg.num_iter:
                    total_steps, smoothed = self._drain(
                        total_steps, smoothed, visualizer)
                    self.save("latest")
                    return self.state

            if self.on_epoch_end is not None:
                # drain first: on_epoch_end may mutate state (s1 template
                # update) and deserves a synced device
                total_steps, smoothed = self._drain(
                    total_steps, smoothed, visualizer)
                t0 = time.perf_counter()
                self.state = self.on_epoch_end(self.state, epoch) or self.state
                self._budget.setdefault("epoch_end", 0.0)
                self._budget["epoch_end"] += time.perf_counter() - t0
                t_mark = time.perf_counter()

            if (epoch + 1) % cfg.save_epoch_freq == 0:
                total_steps, smoothed = self._drain(
                    total_steps, smoothed, visualizer)
                self.save("latest")
                self.save(epoch + 1)

        total_steps, smoothed = self._drain(total_steps, smoothed,
                                            visualizer)
        self.save("latest")
        return self.state

    def _drain(self, total_steps, smoothed, visualizer):
        """Read back the pending step's scalars and run the print /
        visuals / save cadences for it. iter_time is measured dispatch-to-
        drain, i.e. the true per-step cycle cost including the host work
        it overlaps (the reference's iter_time is the same full-cycle
        wall, ref train_s2.py:425-444)."""
        if self._pending is None:
            return total_steps, smoothed
        cfg = self.cfg
        scalars, start, epoch, epoch_iter, db = self._pending
        self._pending = None
        t0 = time.perf_counter()
        total = float(scalars["total_loss"])  # sync point
        self._budget["drain"] += time.perf_counter() - t0
        iter_time = time.time() - start
        smoothed = smoothed * 0.99 + 0.01 * total
        total_steps += 1

        if cfg.print_scalars and total_steps % cfg.print_freq == 0:
            sc = {
                "smoothed_total_loss": smoothed,
                **{k: float(v) for k, v in scalars.items()},
                "iter_time": iter_time,
            }
            visualizer.print_current_scalars(epoch, epoch_iter + 1, sc)

        if (cfg.display_visuals and self.visuals_fn is not None
                and cfg.display_freq > 0  # <=0 = never dump visuals
                and total_steps % cfg.display_freq == 0):
            from .visuals import save_visuals

            t0 = time.perf_counter()
            save_visuals(self.visuals_fn(self.state, db), self.vis_out)
            self._budget["vis"] += time.perf_counter() - t0
            print(green(f"Visualization saved at {self.vis_out}."))

        if total_steps % cfg.save_latest_freq == 0:
            print(green(
                f"saving the model at epoch {epoch}, "
                f"iters {total_steps}"
            ))
            self.save("latest", export_pth=False)
        return total_steps, smoothed

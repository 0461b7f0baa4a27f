"""Pose2Pose pipeline: pose-sequence VAE for template extraction + FGD encoder.

Task parity with the reference's ``core/pipelines/pose2pose.py``: VAE encode ->
reparameterize -> decode; L1 reconstruction (LAMBDA_REG) + elementwise KL (LAMBDA_KL);
after each train step the non-trainable ``clip_code_mu/logvar`` banks
([N_train, code_dim]) are scatter-updated at the batch's clip indices (reference
pose2pose.py:35-36,135-137).  Those banks persist in the checkpoint and are the
coupling surface consumed by Voice2Pose (external code bank + frozen FGD encoder).

TPU-first: the scatter update happens *inside* the jitted step
(``bank.at[idx].set(mu)``), the whole step is one compiled function over the data
mesh, and the reparameterization noise comes from an explicit PRNG key.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import build_model
from ..ops import pose as pose_ops
from ..parallel import device_init, pad_eval_batch, replicate, shard_batch
from ..utils.viz import (draw_pose_frames_in_long_img, vis_relative_pose_clip,
                         vis_relative_pose_pair_clip)
from .trainer import Trainer
from .voice2pose import _adam, _multistep_lr, _pca_2d


class Pose2Pose(Trainer):
    def __init__(self, cfg) -> None:
        super().__init__(cfg)
        self._jit_cache: Dict[Any, Any] = {}

    # -- model -------------------------------------------------------------------
    def setup_model(self, cfg, state_dict=None):
        print("Setting up models on rank", self.get_rank())
        rng = jax.random.PRNGKey(cfg.SYS.SEED)
        self.num_frames = cfg.DATASET.NUM_FRAMES
        code_dim = cfg.POSE2POSE.AUTOENCODER.CODE_DIM

        self.ae = build_model(cfg.POSE2POSE.AUTOENCODER.NAME, cfg)
        init_rng, self._train_rng = jax.random.split(rng)
        n = self.num_train_samples or 1

        def _init_state(rng) -> Dict[str, Any]:
            poses0 = jnp.zeros((1, self.num_frames, 2, cfg.DATASET.NUM_LANDMARKS))
            variables = self.ae.init({"params": rng, "reparam": rng},
                                     poses0, self.num_frames, None, True)
            return {
                "params_ae": variables["params"],
                "batch_stats_ae": variables.get("batch_stats", {}),
                "clip_code_mu": jnp.zeros((n, code_dim), jnp.float32),
                "clip_code_logvar": jnp.zeros((n, code_dim), jnp.float32),
                # seeded at init so the train step's state pytree (which
                # returns an advanced "step") never changes structure or aval
                # after the first dispatch — see parallel.mesh.device_init
                "step": jnp.asarray(0, jnp.int32),
            }

        self.state: Dict[str, Any] = device_init(self.mesh, _init_state, init_rng)

    def setup_optimizer(self, checkpoint=None, last_epoch: int = -1):
        cfg = self.cfg
        spe = (getattr(self, "num_train_batches", 0)
               if getattr(self, "num_train_samples", None) else 0)
        sched = _multistep_lr(cfg.TRAIN.LR, cfg.TRAIN.NUM_EPOCHS, spe,
                              cfg.TRAIN.LR_SCHEDULER)
        self._lr_fns = {"optimizer": sched if callable(sched)
                        else (lambda _s, v=sched: v)}
        self.optimizers = {"optimizer": _adam(sched, cfg.TRAIN.WD)}
        # jitted init: one dispatch, replicated out-shardings (device_init doc)
        from ..parallel.mesh import replicated_sharding

        self.state["opt"] = jax.jit(
            self.optimizers["optimizer"].init,
            out_shardings=replicated_sharding(self.mesh))(self.state["params_ae"])
        self.state = replicate(self.mesh, self.state)

    def current_lrs(self) -> Dict[str, float]:
        step = int(np.asarray(self.state.get("step", 0)))
        return {k: float(fn(step)) for k, fn in self._lr_fns.items()}

    def state_to_save(self):
        return self.state

    def _check_bank_rows(self, bank) -> None:
        """Code banks are scattered at ``clip_index`` every train step
        (update_code_bank); jit DROPS out-of-range scatter indices silently,
        so a bank smaller than the train split corrupts without an error —
        torch's strict load_state_dict raises instead (reference
        trainer.py:183)."""
        n = getattr(self, "num_train_samples", None)
        rows = int(np.shape(bank)[0])
        if n is not None and rows != n:
            raise ValueError(
                f"clip-code bank has {rows} rows but the train split has {n} "
                "clips; a checkpoint can only continue on the dataset it was "
                "trained on")

    def load_torch_pth(self, path: str) -> None:
        from ..utils.torch_import import import_pose2pose

        new_state = import_pose2pose(path, self.state)
        if "clip_code_mu" in new_state:
            self._check_bank_rows(new_state["clip_code_mu"])
        self.state = replicate(self.mesh, new_state)

    def load_state(self, tree, load_optimizers: bool):
        from .trainer import restructure_like

        for k, v in tree.items():
            if not load_optimizers and (k.startswith("opt") or k == "step"):
                continue
            if k == "clip_code_mu":
                self._check_bank_rows(v)
            if k.startswith("opt") and k in self.state:
                self.state[k] = restructure_like(self.state[k], v)
            else:
                self.state[k] = jax.tree.map(jnp.asarray, v)
        self.state = replicate(self.mesh, self.state)

    # -- traced helpers ---------------------------------------------------------------
    def _apply_ae(self, params, batch_stats, poses, num_frames, external_code, rng,
                  train: bool):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        rngs = {"reparam": rng} if external_code is None else {}
        if train and batch_stats:
            out, updates = self.ae.apply(variables, poses, num_frames, external_code,
                                         True, rngs=rngs, mutable=["batch_stats"])
            return out, updates["batch_stats"]
        out = self.ae.apply(variables, poses, num_frames, external_code, train,
                            rngs=rngs)
        return out, batch_stats

    def _losses(self, pred, gt, mu, logvar):
        cfg = self.cfg
        reg = jnp.mean(jnp.abs(pred - gt)) * cfg.POSE2POSE.LAMBDA_REG
        kl = (0.5 * jnp.mean(-logvar + mu ** 2 + jnp.exp(logvar) - 1.0)
              * cfg.POSE2POSE.LAMBDA_KL)
        return {"reg_loss": reg, "kl_loss": kl, "loss": reg + kl}

    def _final_results(self, batch, poses):
        stat = batch["speaker_stat"]
        return pose_ops.get_final_results(
            poses, stat["mean"], stat["std"], stat["scale_factor"],
            self.cfg.DATASET.HIERARCHICAL_POSE, self.cfg.DATASET.NUM_LANDMARKS)

    @staticmethod
    def _step_metrics(pred_final, gt_final, multiple: int = 1):
        """L2 + lip-sync (reference pose2pose.py:246-280)."""
        l2 = jnp.linalg.norm(pred_final - gt_final, axis=2)
        lip_pred = jnp.linalg.norm(pred_final[:, :, :, 75] - pred_final[:, :, :, 71],
                                   axis=-1)
        lip_gt = jnp.linalg.norm(gt_final[:, :, :, 75] - gt_final[:, :, :, 71],
                                 axis=-1)
        denom = lip_gt.max(-1, keepdims=True) + 1e-4
        lip_err = jnp.abs(lip_pred / denom - lip_gt / denom)
        out = {"L2_dist": l2.mean(), "lip_sync_error_n": lip_err.mean()}
        if multiple > 1:
            per = l2.reshape((multiple, -1)).mean(1)
            out["L2_dist_min"] = per.min()
            out["L2_dist_max"] = per.max()
        return out

    # -- jitted steps ---------------------------------------------------------------
    def _build_train_step(self):
        return jax.jit(self._train_step_body(), donate_argnums=(0,))

    def _train_step_body(self):
        """Raw train step — jitted per step by ``_build_train_step`` or
        scanned K-at-a-time by the base trainer's chunked-dispatch path
        (TRAIN.STEPS_PER_DISPATCH; this 22-GFLOP step measured 88%
        host-dispatch overhead per call, docs/PERF.md)."""
        opt = self.optimizers["optimizer"]
        num_frames = self.num_frames

        def step(state, batch, rng):
            def loss_fn(params):
                (pred, mu, logvar), new_bs = self._apply_ae(
                    params, state["batch_stats_ae"], batch["poses"], num_frames,
                    None, rng, True)
                losses = self._losses(pred, batch["poses"], mu, logvar)
                return losses["loss"], (losses, pred, mu, logvar, new_bs)

            (_, (losses, pred, mu, logvar, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state["params_ae"])

            new_state = dict(state)
            updates, new_state["opt"] = opt.update(grads, state["opt"],
                                                   state["params_ae"])
            new_state["params_ae"] = optax.apply_updates(state["params_ae"], updates)
            new_state["batch_stats_ae"] = new_bs

            idx = batch["clip_index"]
            new_state["clip_code_mu"] = state["clip_code_mu"].at[idx].set(
                jax.lax.stop_gradient(mu))
            new_state["clip_code_logvar"] = state["clip_code_logvar"].at[idx].set(
                jax.lax.stop_gradient(logvar))

            pred_final = self._final_results(batch, jax.lax.stop_gradient(pred))
            gt_final = self._final_results(batch, batch["poses"])
            losses.update(self._step_metrics(pred_final, gt_final))
            results = {"poses_pred_batch": pred_final, "poses_gt_batch": gt_final,
                       "clip_code_mu": mu, "clip_code_logvar": logvar}
            new_state["step"] = state.get("step", 0) + 1
            return new_state, losses, results

        return step

    def _build_eval_step(self, multiple: int, valid=None):
        num_frames = self.num_frames
        valid_idx = None if valid is None else jnp.asarray(valid)

        def step(state, batch, rng, external_code):
            if valid_idx is not None:
                # ragged batch padded to the device multiple (pad_eval_batch):
                # statically gather the true rows before any loss/metric
                batch = jax.tree.map(lambda x: x[valid_idx], batch)
                if external_code is not None:
                    external_code = external_code[valid_idx]
            (pred, mu, logvar), _ = self._apply_ae(
                state["params_ae"], state["batch_stats_ae"],
                batch.get("poses"), num_frames, external_code, rng, False)
            results = {"poses_pred_batch": self._final_results(batch, pred),
                       "clip_code_mu": mu, "clip_code_logvar": logvar}
            losses = {}
            if "poses" in batch and external_code is None:
                losses = self._losses(pred, batch["poses"], mu, logvar)
                gt_final = self._final_results(batch, batch["poses"])
                results["poses_gt_batch"] = gt_final
                losses.update(self._step_metrics(results["poses_pred_batch"],
                                                 gt_final, multiple))
            return losses, results

        return jax.jit(step)

    def _get_step(self, kind: str, multiple: int = 1, valid=None, pad_sig=None):
        key = (kind, multiple, pad_sig)
        if key not in self._jit_cache:
            self._jit_cache[key] = (self._build_train_step() if kind == "train"
                                    else self._build_eval_step(multiple, valid))
        return self._jit_cache[key]

    _DEVICE_KEYS = ("poses", "clip_index", "speaker_stat")

    def _device_batch(self, batch):
        return shard_batch(self.mesh, {k: batch[k] for k in self._DEVICE_KEYS
                                       if k in batch})

    def _device_eval_batch(self, batch):
        db = {k: batch[k] for k in self._DEVICE_KEYS if k in batch}
        db, valid, sig = pad_eval_batch(self.mesh, db)
        return shard_batch(self.mesh, db), valid, sig

    def _next_rng(self):
        self._train_rng, sub = jax.random.split(self._train_rng)
        return sub

    # -- Trainer hooks ------------------------------------------------------------------
    def train_step(self, batch, t_step, global_step, epoch, device_batch=None):
        tag = "TRAIN"
        step_fn = self._get_step("train")
        db = device_batch if device_batch is not None else self._device_batch(batch)
        self.state, losses, results = step_fn(self.state, db, self._next_rng())

        if self.is_master_process():
            if t_step % self.cfg.SYS.LOG_INTERVAL == 0:
                self.logger_writer_step(tag, losses, t_step, epoch, global_step)
            if t_step % self.result_saving_interval_train == 0:
                self._save_step_artifacts(tag, t_step, epoch, global_step, batch,
                                          results, self.cfg.TRAIN.SAVE_NPZ,
                                          self.cfg.TRAIN.SAVE_VIDEO)

    def test_step(self, batch, t_step, epoch=0):
        tag = "TEST" if epoch == 0 else "VAL"
        assert isinstance(self.cfg.TEST.MULTIPLE, int) and self.cfg.TEST.MULTIPLE >= 1
        true_bs = int(np.asarray(batch["poses"]).shape[0])
        if self.cfg.TEST.MULTIPLE > 1:
            batch = self.multiply_batch(batch, self.cfg.TEST.MULTIPLE)
        db, valid, sig = self._device_eval_batch(batch)
        step_fn = self._get_step("eval", self.cfg.TEST.MULTIPLE, valid, sig)
        losses, results = step_fn(self.state, db, self._next_rng(), None)

        if self.is_master_process():
            if t_step % self.cfg.SYS.LOG_INTERVAL == 0:
                self.logger_writer_step(tag, losses, t_step, epoch)
            if t_step % self.result_saving_interval_test == 0:
                self._save_step_artifacts(tag, t_step, epoch, None, batch, results,
                                          self.cfg.TEST.SAVE_NPZ,
                                          self.cfg.TEST.SAVE_VIDEO)

        # exact epoch weighting: means over true rows × global true count
        weight = true_bs * jax.process_count()
        batch_losses = {k: np.asarray(v) * weight for k, v in losses.items()}
        return batch_losses, {}

    def demo_step(self, batch, t_step, epoch=0, extra_id=None,
                  interpolation_coeff=None):
        """Decode an external code from DEMO.CODE_PATH npz (reference
        pose2pose.py:50-56: ``np.load(path)['v'][idx] * 10``)."""
        tag = "DEMO"
        assert self.cfg.DEMO.CODE_PATH is not None
        idx = int((self.cfg.DEMO.MULTIPLE - 1) * (interpolation_coeff or 0))
        code = np.load(self.cfg.DEMO.CODE_PATH)["v"][idx] * 10
        code = jnp.asarray(code, jnp.float32)[None]

        db, valid, sig = self._device_eval_batch(batch)
        if sig is not None:
            # batch-1 demo on a >1-device mesh: tile the code over the padded
            # rows; the eval step slices back to the true row
            code = jnp.broadcast_to(code, (sig[0] + sig[1],) + code.shape[1:])
        step_fn = self._get_step("eval", valid=valid, pad_sig=sig)
        _, results = step_fn(self.state, db, self._next_rng(), code)

        if self.is_master_process():
            np_results = {k: np.asarray(v) for k, v in results.items()
                          if v is not None}
            if self.cfg.TEST.SAVE_NPZ:
                self.save_results(tag, t_step, epoch, self.base_path, np_results,
                                  extra_id=extra_id)
            if self.cfg.TEST.SAVE_VIDEO:
                pred = np_results["poses_pred_batch"][0]
                vid = self.generate_video(pred)
                long_img = draw_pose_frames_in_long_img(pred.transpose(0, 2, 1))
                audio = batch.get("audio")
                self.video_writer.save_video(
                    self.cfg, tag, vid, t_step, epoch, long_img=long_img,
                    audio=None if audio is None else np.asarray(audio[0]),
                    writer=self.tb_writer, base_path=self.base_path,
                    extra_id=extra_id)

    # -- figures / artifacts -------------------------------------------------------------
    def draw_figure_epoch(self):
        fig_dict = {}
        msg = "[TRAIN] epoch plotting: "
        if self.cfg.POSE2POSE.AUTOENCODER.CODE_DIM is not None:
            import matplotlib

            matplotlib.use("Agg")
            from matplotlib import pyplot as plt

            code = np.asarray(self.state["clip_code_mu"])
            fig = plt.figure()
            xy = _pca_2d(code)
            plt.scatter(xy[:, 0], xy[:, 1], alpha=0.2, edgecolors="none", s=1)
            fig.tight_layout()
            fig_dict["clip_code"] = fig
            plt.close()
            msg += "Clip Code, "
        logging.info(msg)
        return fig_dict

    def _save_step_artifacts(self, tag, t_step, epoch, global_step, batch, results,
                             save_npz, save_video):
        if not (save_npz or save_video):
            # nothing to save — above all, do NOT fetch (remote-tunnel result
            # pulls dominated the production train wall; see voice2pose.py)
            return
        np_results = jax.device_get(
            {k: v for k, v in results.items() if v is not None})
        if save_npz:
            self.save_results(tag, t_step, epoch, self.base_path, np_results)
        if save_video:
            pred = np_results["poses_pred_batch"][0]
            gt = np_results["poses_gt_batch"][0]
            vid = self.generate_video_pair(pred, gt)
            audio = batch.get("audio")
            self.video_writer.save_video(
                self.cfg, tag, vid, t_step, epoch, global_step,
                audio=None if audio is None else np.asarray(audio[0]),
                writer=self.tb_writer, base_path=self.base_path)

    def generate_video_pair(self, pred, gt):
        s = self.cfg.SYS.VISUALIZATION_SCALING
        return vis_relative_pose_pair_clip(pred * s, gt * s, self.cfg.SYS.CANVAS_SIZE)

    def generate_video(self, poses):
        s = self.cfg.SYS.VISUALIZATION_SCALING
        return vis_relative_pose_clip(poses * s, self.cfg.SYS.CANVAS_SIZE)

    def save_results(self, tag, step, epoch, base_path, results_dict, extra_id=None):
        tic = time.time()
        res_dir = os.path.join(base_path, "results")
        os.makedirs(res_dir, exist_ok=True)
        suffix = "" if extra_id is None else f"-{extra_id}"
        path = f"{res_dir}/epoch{epoch}-{tag}-step{step}{suffix}.npz"
        if os.path.exists(path):
            os.remove(path)
        np.savez(path, **results_dict)
        logging.info("[%s] epoch: %d/%d  step: %d  Saved results in an npz file in "
                     "%.3f seconds.", tag, epoch, self.cfg.TRAIN.NUM_EPOCHS, step,
                     time.time() - tic)

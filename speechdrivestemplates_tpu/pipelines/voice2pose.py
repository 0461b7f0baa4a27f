"""Voice2Pose pipeline: speech -> gesture generator (+ template code bank, + LSGAN).

Task parity with the reference's ``core/pipelines/voice2pose.py``:
  model    = mel frontend + SequenceGeneratorCNN + learned clip-code bank
             [N_train, 32] (or frame-variant [N_train, 32, T]), or an external bank
             loaded from a Pose2Pose checkpoint (EXTERNAL_CODE); frozen PoseSeqEncoder
             for FGD features; optional PoseSequenceDiscriminator.
  losses   = L1 regression (LAMBDA_REG) + batch-statistics KL on the codes
             (LAMBDA_CLIP_KL, skipped while code variance is exactly 0, i.e. the first
             step after zero-init — reference voice2pose.py:147-157) + LSGAN
             (LAMBDA_GAN) with optional motion differencing and keypoint WHITE_LIST.
  metrics  = per-step denormalized L2 and normalized lip-sync error
             (voice2pose.py:412-430); per-epoch FGD over accumulated latents.

TPU-first design: the whole optimization step (mel -> forward -> THREE gradient
computations -> three optax updates -> denormalized metrics) is ONE jitted function
over the data mesh.  The reference's ``G_loss.backward(retain_graph=True)`` then
``D_loss.backward()`` (voice2pose.py:297-309) becomes two independent ``jax.grad``
calls that share one generator forward: the G grad returns the prediction as aux, the
D grad consumes it as a constant (= ``.detach()``).
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
from ..ops.fgd import compute_fgd
from ..ops.mel import mel_frames_for_audio_length, mel_spectrogram
from ..parallel import device_init, pad_eval_batch, replicate, shard_batch
from ..utils.viz import (draw_pose_frames_in_long_img, vis_relative_pose_clip,
                         vis_relative_pose_pair_clip)
from .trainer import Trainer


def _multistep_lr(base_lr: float, num_epochs: int, steps_per_epoch: int,
                  enabled: bool):
    """MultiStepLR at epochs [N-10, N-2], gamma 0.1 (reference voice2pose.py:253-257),
    expressed as an optax step-indexed piecewise-constant schedule.

    torch semantics (torch.optim.lr_scheduler.MultiStepLR, pinned by
    tests/test_trainer_utils.py against the real scheduler): lr during epoch
    ``e`` is ``base * 0.1 ** |{m in milestones : 0 <= m <= e}|`` — a NEGATIVE
    milestone (NUM_EPOCHS < 10) never fires because the epoch counter starts
    at 0, and milestone 0 fires at scheduler construction, scaling the lr
    from the very first step.  Repeated milestones would compound (gamma^2)
    via torch's Counter; [N-10, N-2] are always distinct so only the
    never/at-init cases arise here."""
    if not enabled or steps_per_epoch <= 0:
        return base_lr
    scale0 = 1.0
    boundaries = {}
    for m in (num_epochs - 10, num_epochs - 2):
        if m == 0:
            scale0 *= 0.1
        elif m > 0:
            b = m * steps_per_epoch
            boundaries[b] = boundaries.get(b, 1.0) * 0.1
        # m < 0: torch never reaches it — no decay
    if not boundaries:
        return base_lr * scale0
    # optax piecewise_constant applies the scale for count >= boundary, i.e.
    # from the first optimizer step of epoch m — matching torch's
    # end-of-epoch(m-1) scheduler.step()
    return optax.piecewise_constant_schedule(base_lr * scale0, boundaries)


def _adam(lr, wd: float = 0.0):
    """torch.optim.Adam semantics: L2 term added to the gradient before moments."""
    chain = []
    if wd:
        chain.append(optax.add_decayed_weights(wd))
    chain += [optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
              optax.scale_by_learning_rate(lr)]
    return optax.chain(*chain)


def _mse(x, target):
    return jnp.mean((x - target) ** 2)


class Voice2Pose(Trainer):
    """Pipeline wrapper (reference Voice2Pose trainer, voice2pose.py:212-511)."""

    def __init__(self, cfg) -> None:
        super().__init__(cfg)
        self.has_code = cfg.VOICE2POSE.GENERATOR.CLIP_CODE.DIMENSION is not None
        self.has_disc = cfg.VOICE2POSE.POSE_DISCRIMINATOR.NAME is not None
        self.has_pe = cfg.VOICE2POSE.POSE_ENCODER.NAME is not None
        self.external_code = (self.has_code
                              and cfg.VOICE2POSE.GENERATOR.CLIP_CODE.EXTERNAL_CODE)
        self._jit_cache: Dict[Any, Any] = {}

    # -- model construction ------------------------------------------------------
    def setup_model(self, cfg, state_dict=None):
        print("Setting up models on rank", self.get_rank())
        rng = jax.random.PRNGKey(cfg.SYS.SEED)
        self.num_frames = cfg.DATASET.NUM_FRAMES
        T_mel = self._mel_frames(cfg.DATASET.AUDIO_LENGTH)

        self.generator = build_model(cfg.VOICE2POSE.GENERATOR.NAME, cfg)
        g_rng, d_rng, pe_rng, self._eval_rng = jax.random.split(rng, 4)

        code_dim = cfg.VOICE2POSE.GENERATOR.CLIP_CODE.DIMENSION
        if self.has_disc:
            self.discriminator = build_model(cfg.VOICE2POSE.POSE_DISCRIMINATOR.NAME, cfg)
        if self.has_pe:
            self.pose_encoder = build_model(cfg.VOICE2POSE.POSE_ENCODER.NAME, cfg)

        def _init_state(g_rng, d_rng, pe_rng) -> Dict[str, Any]:
            mel0 = jnp.zeros((1, 80, T_mel), jnp.float32)
            code0 = jnp.zeros((1, code_dim), jnp.float32) if self.has_code else None
            g_vars = self.generator.init(g_rng, mel0, self.num_frames, code0, True)
            st: Dict[str, Any] = {
                "params_g": g_vars["params"],
                "batch_stats_g": g_vars.get("batch_stats", {}),
                # seeded at init so the train step's state pytree (which
                # returns an advanced "step") never changes structure or aval
                # after the first dispatch — see parallel.mesh.device_init
                "step": jnp.asarray(0, jnp.int32),
            }

            # learned template bank (reference voice2pose.py:63-70); an external
            # bank from a Pose2Pose checkpoint is loaded host-side below
            if self.has_code and not self.external_code:
                n = self.num_train_samples
                if n is None:
                    n = 1  # overwritten by checkpoint load in eval modes
                shape = ((n, code_dim, cfg.DATASET.NUM_FRAMES)
                         if cfg.VOICE2POSE.GENERATOR.CLIP_CODE.FRAME_VARIANT
                         else (n, code_dim))
                st["clips_code"] = jnp.zeros(shape, jnp.float32)

            if self.has_disc:
                t_in = (self.num_frames - 1 if cfg.VOICE2POSE.POSE_DISCRIMINATOR.MOTION
                        else self.num_frames)
                wl = cfg.VOICE2POSE.POSE_DISCRIMINATOR.WHITE_LIST
                k_in = len(wl) if wl is not None else cfg.DATASET.NUM_LANDMARKS
                d_vars = self.discriminator.init(
                    d_rng, jnp.zeros((1, t_in, 2, k_in)), True)
                st["params_d"] = d_vars["params"]
                st["batch_stats_d"] = d_vars.get("batch_stats", {})

            if self.has_pe:
                pe_vars = self.pose_encoder.init(
                    pe_rng,
                    jnp.zeros((1, self.num_frames, 2, cfg.DATASET.NUM_LANDMARKS)),
                    True)
                st["params_pe"] = pe_vars["params"]
                st["batch_stats_pe"] = pe_vars.get("batch_stats", {})
            return st

        self.state: Dict[str, Any] = device_init(self.mesh, _init_state,
                                                 g_rng, d_rng, pe_rng)

        # host-side fills (file loads), then one batched re-replicate
        if self.has_code and self.external_code:
            self.state["clips_code"] = jnp.asarray(self._load_external_code(cfg))
        if self.has_pe and cfg.VOICE2POSE.POSE_ENCODER.AE_CHECKPOINT is not None:
            self._load_pose_encoder(cfg.VOICE2POSE.POSE_ENCODER.AE_CHECKPOINT)
        self.state = replicate(self.mesh, self.state)

    def _mel_frames(self, audio_length: int) -> int:
        from ..utils.audio import parse_audio_length

        snapped, _ = parse_audio_length(audio_length, self.cfg.DATASET.AUDIO_SR,
                                        self.cfg.DATASET.FPS)
        return mel_frames_for_audio_length(snapped)

    def _load_external_code(self, cfg) -> np.ndarray:
        """Template code bank = clip_code_mu buffer of a Pose2Pose checkpoint
        (reference voice2pose.py:40-57)."""
        path = (cfg.VOICE2POSE.GENERATOR.CLIP_CODE.EXTERNAL_CODE_PTH
                or cfg.VOICE2POSE.POSE_ENCODER.AE_CHECKPOINT)
        if path is None:
            raise RuntimeError("External code not provide.")
        if self._is_torch_pth(path):
            # a reference-trained Pose2Pose .pth works directly (its bank is
            # the 'clip_code_mu' buffer, reference voice2pose.py:40-57)
            from ..utils.torch_import import load_torch_state_dict

            bank = np.asarray(load_torch_state_dict(path)["clip_code_mu"])
        else:
            tree = self.load_checkpoint_tree(path)
            bank = np.asarray(tree["state"]["clip_code_mu"])
        self._check_bank_rows(bank)
        return bank

    def _load_pose_encoder(self, path: str) -> None:
        """Frozen FGD encoder weights from a Pose2Pose (AE) checkpoint — the AE's
        'encoder' subtree transplants directly onto the standalone PoseSeqEncoder
        (reference strips the 'module.ae.encoder.' prefix, voice2pose.py:234-242)."""
        if self._is_torch_pth(path):
            # reference-trained Pose2Pose .pth: its 'ae.encoder.*' layers map
            # onto the standalone PoseSeqEncoder by name
            from ..utils.torch_import import (_to_mutable, import_module_params,
                                              load_torch_state_dict,
                                              translate_pose_encoder)

            sd = load_torch_state_dict(path)
            params = _to_mutable(self.state["params_pe"])
            bs = _to_mutable(self.state.get("batch_stats_pe", {}))
            filled = import_module_params(sd, "ae.encoder.", params, bs,
                                          translate_pose_encoder)
            # every frozen-encoder leaf must come from the checkpoint — a
            # partial fill would leave random-init weights silently computing
            # meaningless FGD/FTD metrics
            n_leaves = (len(jax.tree.leaves(params)) + len(jax.tree.leaves(bs)))
            if filled != n_leaves:
                raise ValueError(
                    f"AE checkpoint {path!r} filled {filled} of {n_leaves} "
                    "frozen-encoder tensors; its encoder architecture does "
                    "not match VOICE2POSE.POSE_ENCODER")
            self.state["params_pe"], self.state["batch_stats_pe"] = params, bs
            return
        tree = self.load_checkpoint_tree(path)
        self.state["params_pe"] = jax.tree.map(
            jnp.asarray, tree["state"]["params_ae"]["encoder"])
        bs = tree["state"].get("batch_stats_ae") or {}
        if "encoder" in bs:
            self.state["batch_stats_pe"] = jax.tree.map(jnp.asarray, bs["encoder"])

    # -- optimizers ----------------------------------------------------------------
    def setup_optimizer(self, checkpoint=None, last_epoch: int = -1):
        cfg = self.cfg
        spe = (getattr(self, "num_train_batches", 0)
               if getattr(self, "num_train_samples", None) else 0)
        self._lr_fns = {}

        def make(label, base_lr):
            sched = _multistep_lr(base_lr, cfg.TRAIN.NUM_EPOCHS, spe,
                                  cfg.TRAIN.LR_SCHEDULER)
            self._lr_fns[label] = sched if callable(sched) else (lambda _s, v=sched: v)
            return _adam(sched, cfg.TRAIN.WD if label == "optimizerG" else 0.0)

        self.optimizers = {"optimizerG": make("optimizerG", cfg.TRAIN.LR)}
        if self.has_disc:
            self.optimizers["optimizerD_pose"] = make("optimizerD_pose", cfg.TRAIN.LR)
        if self.has_code and not self.external_code:
            lr = cfg.TRAIN.LR * cfg.VOICE2POSE.GENERATOR.CLIP_CODE.LR_SCALING
            self.optimizers["optimizerClipCode"] = make("optimizerClipCode", lr)

        # all optimizer states in one jitted dispatch, replicated out-shardings
        # (see parallel.mesh.device_init — eager optax init is one device op
        # per parameter leaf, minutes of latency on a remote backend)
        from ..parallel.mesh import replicated_sharding

        def _init_opts(params_g, params_d, clips_code):
            opts = {"opt_g": self.optimizers["optimizerG"].init(params_g)}
            if self.has_disc:
                opts["opt_d"] = self.optimizers["optimizerD_pose"].init(params_d)
            if self.has_code and not self.external_code:
                opts["opt_code"] = self.optimizers["optimizerClipCode"].init(
                    clips_code)
            return opts

        self.state.update(jax.jit(
            _init_opts, out_shardings=replicated_sharding(self.mesh))(
            self.state["params_g"], self.state.get("params_d"),
            self.state.get("clips_code")))
        self.state = replicate(self.mesh, self.state)

    def current_lrs(self) -> Dict[str, float]:
        step = int(np.asarray(self.state.get("step", 0)))
        return {k.replace("optimizer", ""): float(fn(step))
                for k, fn in self._lr_fns.items()}

    # -- checkpoint pytree --------------------------------------------------------
    def state_to_save(self):
        return self.state

    def _check_bank_rows(self, bank) -> None:
        """Loaded template banks must have one code per train clip.  torch's
        strict ``load_state_dict`` raises on this mismatch (reference
        trainer.py:183); without the check the train step's
        ``clips_code[clip_index]`` gather clamps out-of-range indices
        SILENTLY under jit and training is corrupted, not crashed."""
        n = getattr(self, "num_train_samples", None)
        rows = int(np.shape(bank)[0])
        if n is not None and rows != n:
            raise ValueError(
                f"clip-code bank has {rows} rows but the train split has {n} "
                "clips; template codes are per-clip, so a checkpoint can only "
                "continue on the dataset it was trained on (the reference's "
                "strict load_state_dict enforces the same size)")

    def load_torch_pth(self, path: str) -> None:
        from ..utils.torch_import import import_voice2pose

        new_state = import_voice2pose(path, self.state)
        if "clips_code" in new_state:
            self._check_bank_rows(new_state["clips_code"])
        self.state = replicate(self.mesh, new_state)

    def load_state(self, tree, load_optimizers: bool):
        from .trainer import restructure_like

        for k, v in tree.items():
            if not load_optimizers and (k.startswith("opt_") or k == "step"):
                continue
            if k == "clips_code":
                self._check_bank_rows(v)
            if k == "params_pe" and self.cfg.VOICE2POSE.POSE_ENCODER.AE_CHECKPOINT:
                continue  # freshly loaded frozen encoder wins
            if not self.cfg.VOICE2POSE.STRICT_LOADING and k not in self.state:
                continue
            if k.startswith("opt_") and k in self.state:
                # orbax raw restores lose optax NamedTuple types; rebuild by key
                self.state[k] = restructure_like(self.state[k], v)
            else:
                self.state[k] = jax.tree.map(jnp.asarray, v)
        self.state = replicate(self.mesh, self.state)

    # -- forward helpers (traced) ----------------------------------------------------
    def _apply_generator(self, params, batch_stats, mel, num_frames, code, train,
                         valid_lens=None):
        """``valid_lens``: optional traced ``(t_mel_valid, num_frames_valid)``
        scalars for the length-polymorphic bucketed demo path (one executable
        per length bucket; see _bucket_demo_batch)."""
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        if train and batch_stats:
            out, updates = self.generator.apply(
                variables, mel, num_frames, code, True, mutable=["batch_stats"])
            return out, updates["batch_stats"]
        t_mel_valid, num_frames_valid = valid_lens or (None, None)
        return self.generator.apply(
            variables, mel, num_frames, code, train,
            stem_weights=(None if train or valid_lens is not None
                          else self._stem_weights(params, mel.shape[-1])),
            t_mel_valid=t_mel_valid,
            num_frames_valid=num_frames_valid), batch_stats

    def _stem_weights(self, params_g, t_mel: int):
        """Conv kernels for the fused Pallas stem (inference only), or None when
        the configuration/backend/width is outside the kernel's envelope."""
        if not self.cfg.SYS.FUSED_STEM:
            return None
        if self.mesh is not None and self.mesh.size > 1:
            # pallas_call cannot be auto-partitioned: under a >1-device data
            # mesh the eval step's batch is sharded and embedding the kernel
            # would fail to compile (or silently gather). Use the XLA path.
            return None
        try:
            # Experimental kernel, shipped OUTSIDE the package next to its
            # cost probes (measured slower than the XLA lowering at the
            # production serving point — docs/PERF.md "Stem speed-of-light"):
            # available from a repo checkout only.
            from probes.stem_pallas import (stem_supported,
                                            stem_weights_from_params)
        except ImportError:
            logging.warning("SYS.FUSED_STEM requires probes/stem_pallas.py "
                            "(repo checkout); using the XLA stem")
            return None

        dtype = (jnp.bfloat16 if self.cfg.TRAIN.PRECISION == "bf16"
                 else jnp.float32)
        if not stem_supported(t_mel, self.cfg.VOICE2POSE.GENERATOR.NORM, dtype):
            return None
        return stem_weights_from_params(params_g)

    def _apply_disc(self, params, batch_stats, poses, train):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        if train and batch_stats:
            out, updates = self.discriminator.apply(
                variables, poses, True, mutable=["batch_stats"])
            return out, updates["batch_stats"]
        return self.discriminator.apply(variables, poses, train), batch_stats

    def _apply_pose_encoder(self, state, poses):
        variables = {"params": state["params_pe"]}
        if state.get("batch_stats_pe"):
            variables["batch_stats"] = state["batch_stats_pe"]
        return self.pose_encoder.apply(variables, poses, False)  # frozen, eval mode

    def _apply_pose_encoder_train(self, state, poses, batch_stats):
        """TRAIN-mode FGD-encoder forward: the reference's 'frozen' pose
        encoder sits inside a model in ``train()`` mode, so every training
        forward normalizes with BATCH statistics and EMAs the BN running
        stats — under ``torch.no_grad()`` but stats still move (reference
        voice2pose.py:162-176 + building_blocks BN).  Its parameters never
        update (only netG is in optimizerG), but the drifted running stats
        are what the reference's --test_only later evaluates with; matching
        at convergence requires reproducing the drift.  Returns
        (mu, logvar, new_batch_stats)."""
        if not batch_stats:
            mu, lv = self.pose_encoder.apply({"params": state["params_pe"]},
                                             poses, False)
            return mu, lv, batch_stats
        (mu, lv), upd = self.pose_encoder.apply(
            {"params": state["params_pe"], "batch_stats": batch_stats},
            poses, True, mutable=["batch_stats"])
        return mu, lv, upd["batch_stats"]

    def _disc_input(self, poses):
        """WHITE_LIST keypoint masking + motion differencing
        (reference voice2pose.py:182-192)."""
        cfg_d = self.cfg.VOICE2POSE.POSE_DISCRIMINATOR
        if cfg_d.WHITE_LIST is not None:
            poses = poses[..., np.asarray(list(cfg_d.WHITE_LIST), dtype=np.int32)]
        if cfg_d.MOTION:
            poses = poses[:, 1:] - poses[:, :-1]
        return poses

    def _condition_code(self, state, batch, train: bool, rng,
                        interpolation_coeff=None):
        """Code selection (reference voice2pose.py:92-122); all mode switches are
        static cfg flags, so each active combination traces once."""
        if not self.has_code:
            return None
        cc = self.cfg.VOICE2POSE.GENERATOR.CLIP_CODE
        bank = state["clips_code"]
        B = batch["audio"].shape[0]
        if train:
            return bank[batch["clip_index"]]
        if cc.SAMPLE_FROM_NORMAL:
            return jax.random.normal(rng, (B, cc.DIMENSION))
        if cc.TEST_WITH_GT_CODE:
            gt = batch["poses"]
            if not self.cfg.DATASET.HIERARCHICAL_POSE:
                gt = self._p2g_renorm(batch, gt)
            mu_gt, _ = self._apply_pose_encoder(state, gt)
            return mu_gt
        if self.cfg.DEMO.CODE_INDEX is not None:
            code = jnp.broadcast_to(bank[self.cfg.DEMO.CODE_INDEX][None],
                                    (B,) + bank.shape[1:])
            if interpolation_coeff is not None:
                code_b = jnp.broadcast_to(bank[self.cfg.DEMO.CODE_INDEX_B][None],
                                          (B,) + bank.shape[1:])
                code = code * (1 - interpolation_coeff) + code_b * interpolation_coeff
            return code
        idx = jax.random.randint(rng, (B,), 0, bank.shape[0])
        return bank[idx]

    def _p2g_renorm(self, batch, poses):
        """Parted->global re-normalization for the FGD encoder when training
        non-hierarchically (reference voice2pose.py:104-106,165-170)."""
        stat = batch["speaker_stat"]
        statg = batch["speaker_stat_global"]
        return pose_ops.transform_normalized_parted2global(
            poses, stat["mean"], stat["std"], statg["mean"], statg["std"],
            self.cfg.DATASET.NUM_LANDMARKS)

    # -- loss assembly (traced) ------------------------------------------------------
    def _generator_losses(self, pred, gt, code, state_d, train):
        cfg = self.cfg
        losses = {}
        reg = jnp.mean(jnp.abs(pred - gt)) * cfg.VOICE2POSE.GENERATOR.LAMBDA_REG
        losses["G_reg_loss"] = reg
        g_loss = reg

        if code is not None:
            if cfg.VOICE2POSE.GENERATOR.CLIP_CODE.FRAME_VARIANT:
                flat = jnp.swapaxes(code, 1, 2).reshape(-1, code.shape[1])
            else:
                flat = code
            mu = flat.mean(axis=0)
            var = flat.var(axis=0, ddof=1)
            kl = (0.5 * jnp.mean(-jnp.log(jnp.where(var > 0, var, 1.0))
                                 + mu ** 2 + var - 1.0)
                  * cfg.VOICE2POSE.GENERATOR.LAMBDA_CLIP_KL)
            # reference skips the term while any var == 0 (zero-init first step)
            kl = jnp.where(jnp.all(var != 0), kl, 0.0)
            losses["G_clipcode_kl_loss"] = kl
            g_loss = g_loss + kl

        if self.has_disc:
            fake_in = self._disc_input(pred)
            # Running-stat updates from this forward are discarded: the D's
            # stat cadence is reproduced exactly in _disc_losses (see below).
            score_fake, _ = self._apply_disc(state_d[0], state_d[1], fake_in, train)
            gan = (_mse(score_fake, jnp.ones_like(score_fake))
                   * cfg.VOICE2POSE.POSE_DISCRIMINATOR.LAMBDA_GAN)
            losses["G_pose_gan_loss"] = gan
            g_loss = g_loss + gan

        losses["G_loss"] = g_loss
        return g_loss, losses

    def _disc_losses(self, params_d, batch_stats_d, fake, real, train):
        cfg_d = self.cfg.VOICE2POSE.POSE_DISCRIMINATOR
        fake_in = self._disc_input(fake)
        real_in = self._disc_input(real)
        score_real, bs1 = self._apply_disc(params_d, batch_stats_d, real_in, train)
        score_fake, bs2 = self._apply_disc(params_d, bs1, fake_in, train)
        if train and bs2:
            # The reference runs THREE train-mode D forwards per step — real,
            # fake (for the G loss), fake.detach() (voice2pose.py:193-195) —
            # so its BN running stats EMA three batches per step, the last two
            # with identical batch statistics.  EMA is linear, so the third
            # update is the closed-form extrapolation bs3 = bs2 + m*(bs2 - bs1)
            # (m = EMA decay): exact cadence parity with zero extra forwards.
            from ..models.blocks import BN_MOMENTUM

            bs2 = jax.tree.map(lambda b2, b1: b2 + BN_MOMENTUM * (b2 - b1),
                               bs2, bs1)
        d_fake = _mse(score_fake, jnp.zeros_like(score_fake))
        d_real = _mse(score_real, jnp.ones_like(score_real))
        d_loss = (d_real + d_fake) * cfg_d.LAMBDA_GAN
        aux = {"D_pose_gan_loss": d_loss,
               "pose_score_fake": score_fake.mean(),
               "pose_score_real": score_real.mean()}
        return d_loss, (aux, bs2)

    # -- metrics (traced; reference voice2pose.py:412-430) ---------------------------
    @staticmethod
    def _step_metrics(pred_final, gt_final):
        l2 = jnp.linalg.norm(pred_final - gt_final, axis=2)
        lip_pred = jnp.linalg.norm(pred_final[:, :, :, 75] - pred_final[:, :, :, 71],
                                   axis=-1)
        lip_gt = jnp.linalg.norm(gt_final[:, :, :, 75] - gt_final[:, :, :, 71],
                                 axis=-1)
        denom = lip_gt.max(-1, keepdims=True) + 1e-4
        lip_err = jnp.abs(lip_pred / denom - lip_gt / denom)
        return {"L2_dist": l2.mean(), "lip_sync_error_n": lip_err.mean()}

    def _final_results(self, batch, poses):
        stat = batch["speaker_stat"]
        return pose_ops.get_final_results(
            poses, stat["mean"], stat["std"], stat["scale_factor"],
            self.cfg.DATASET.HIERARCHICAL_POSE, self.cfg.DATASET.NUM_LANDMARKS)

    # -- the jitted steps -------------------------------------------------------------
    def _train_step_body(self):
        """Raw train step — jitted per step by ``_get_train_step`` or scanned
        K-at-a-time by the base trainer's chunked-dispatch path
        (TRAIN.STEPS_PER_DISPATCH, config.py)."""
        num_frames = self.num_frames
        gen_opt = self.optimizers["optimizerG"]
        code_opt = self.optimizers.get("optimizerClipCode")
        disc_opt = self.optimizers.get("optimizerD_pose")
        mel_impl = self.cfg.SYS.MEL_IMPL

        def step(state, batch, rng):
            mel = mel_spectrogram(batch["audio"], impl=mel_impl)

            def g_loss_fn(params_g, clips_code):
                st = dict(state)
                st["clips_code"] = clips_code
                code = (clips_code[batch["clip_index"]] if self.has_code else None)
                pred, new_bs_g = self._apply_generator(
                    params_g, state["batch_stats_g"], mel, num_frames, code, True)
                state_d = ((state["params_d"], state["batch_stats_d"])
                           if self.has_disc else None)
                g_loss, losses = self._generator_losses(
                    pred, batch["poses"], code, state_d, True)
                return g_loss, (losses, pred, new_bs_g)

            code_arg = state.get("clips_code", jnp.zeros((1, 1)))
            (g_loss, (losses, pred, new_bs_g)), grads = (
                jax.value_and_grad(g_loss_fn, argnums=(0, 1), has_aux=True)(
                    state["params_g"], code_arg))
            g_grads, code_grads = grads

            new_state = dict(state)
            updates, new_state["opt_g"] = gen_opt.update(
                g_grads, state["opt_g"], state["params_g"])
            new_state["params_g"] = optax.apply_updates(state["params_g"], updates)
            new_state["batch_stats_g"] = new_bs_g

            if self.has_code and not self.external_code:
                cupd, new_state["opt_code"] = code_opt.update(
                    code_grads, state["opt_code"], state["clips_code"])
                new_state["clips_code"] = optax.apply_updates(
                    state["clips_code"], cupd)

            if self.has_disc:
                fake = jax.lax.stop_gradient(pred)
                def d_loss_fn(params_d):
                    return self._disc_losses(params_d, state["batch_stats_d"],
                                             fake, batch["poses"], True)
                (d_loss, (d_aux, bs_d2)), d_grads = jax.value_and_grad(
                    d_loss_fn, has_aux=True)(state["params_d"])
                dupd, new_state["opt_d"] = disc_opt.update(
                    d_grads, state["opt_d"], state["params_d"])
                new_state["params_d"] = optax.apply_updates(
                    state["params_d"], dupd)
                new_state["batch_stats_d"] = bs_d2
                losses.update(d_aux)

            # FGD features from the frozen encoder (reference voice2pose.py:162-176):
            # TRAIN-mode forwards, pred then gt — batch-stat normalization +
            # two sequential BN running-stat EMA updates per step, exactly the
            # reference's cadence (its params stay frozen; its stats do not)
            results = {}
            if self.has_pe:
                if self.cfg.DATASET.HIERARCHICAL_POSE:
                    enc_pred, enc_gt = pred, batch["poses"]
                else:
                    enc_pred = self._p2g_renorm(batch, pred)
                    enc_gt = self._p2g_renorm(batch, batch["poses"])
                mu_p, lv_p, bs_pe = self._apply_pose_encoder_train(
                    state, enc_pred, state.get("batch_stats_pe"))
                mu_g, lv_g, bs_pe = self._apply_pose_encoder_train(
                    state, enc_gt, bs_pe)
                if bs_pe:
                    new_state["batch_stats_pe"] = bs_pe
                results.update({"mu_pred": mu_p, "logvar_pred": lv_p,
                                "mu_gt": mu_g, "logvar_gt": lv_g})

            pred_final = self._final_results(batch, pred)
            gt_final = self._final_results(batch, batch["poses"])
            losses.update(self._step_metrics(pred_final, gt_final))
            results.update({"poses_pred_batch": pred_final,
                            "poses_gt_batch": gt_final})
            new_state["step"] = state.get("step", 0) + 1
            return new_state, losses, results

        return step

    def _build_eval_step(self, num_frames: int, valid=None):
        mel_impl = self.cfg.SYS.MEL_IMPL
        valid_idx = None if valid is None else jnp.asarray(valid)

        def step(state, batch, rng, interpolation_coeff, fixed_code=None,
                 valid_lens=None):
            if valid_idx is not None:
                # ragged last batch, padded to the device multiple by
                # pad_eval_batch: statically gather the true rows so every
                # loss/metric below runs on exactly the real samples
                batch = jax.tree.map(lambda x: x[valid_idx], batch)
                if fixed_code is not None:
                    fixed_code = fixed_code[valid_idx]
            mel = mel_spectrogram(batch["audio"], impl=mel_impl)
            code = (fixed_code if fixed_code is not None
                    else self._condition_code(state, batch, False, rng,
                                              interpolation_coeff))
            pred, _ = self._apply_generator(
                state["params_g"], state["batch_stats_g"], mel, num_frames, code,
                False, valid_lens=valid_lens)
            results = {"poses_pred_batch": self._final_results(batch, pred),
                       "condition_code": code}
            losses = {}
            if "poses" in batch:
                gt = batch["poses"]
                state_d = ((state["params_d"], state["batch_stats_d"])
                           if self.has_disc else None)
                _, losses = self._generator_losses(pred, gt, code, state_d, False)
                if self.has_disc:
                    d_loss, (d_aux, _) = self._disc_losses(
                        state["params_d"], state["batch_stats_d"], pred, gt, False)
                    losses.update(d_aux)
                if self.has_pe:
                    if self.cfg.DATASET.HIERARCHICAL_POSE:
                        enc_pred, enc_gt = pred, gt
                    else:
                        enc_pred = self._p2g_renorm(batch, pred)
                        enc_gt = self._p2g_renorm(batch, gt)
                    mu_p, lv_p = self._apply_pose_encoder(state, enc_pred)
                    mu_g, lv_g = self._apply_pose_encoder(state, enc_gt)
                    results.update({"mu_pred": mu_p, "logvar_pred": lv_p,
                                    "mu_gt": mu_g, "logvar_gt": lv_g})
                gt_final = self._final_results(batch, gt)
                results["poses_gt_batch"] = gt_final
                losses.update(self._step_metrics(results["poses_pred_batch"],
                                                 gt_final))
            return losses, results

        return jax.jit(step, static_argnames=())

    def _get_train_step(self):
        key = ("train", self.num_frames)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(self._train_step_body(),
                                           donate_argnums=(0,))
        return self._jit_cache[key]

    def _get_eval_step(self, num_frames: int, t_mel: int, valid=None,
                       pad_sig=None, length_poly: bool = False):
        # t_mel is part of the cache key only: jit retraces per audio shape
        # anyway, but keying keeps one Python closure per compiled shape.
        # pad_sig identifies the ragged-batch pad geometry (one extra compile
        # for the dataset's final ragged batch).  length_poly marks the
        # bucketed demo executable (traced valid lengths; _bucket_demo_batch).
        key = ("eval", num_frames, t_mel, pad_sig, length_poly)
        if key not in self._jit_cache:
            self._jit_cache[key] = self._build_eval_step(num_frames, valid)
        return self._jit_cache[key]

    # -- batch marshalling -----------------------------------------------------------
    _DEVICE_KEYS = ("audio", "poses", "clip_index", "speaker_stat",
                    "speaker_stat_global")

    def _device_batch(self, batch):
        db = {k: batch[k] for k in self._DEVICE_KEYS if k in batch}
        return shard_batch(self.mesh, db)

    def _device_eval_batch(self, batch):
        """Eval marshalling: pad a ragged batch to the device multiple and
        return (sharded_batch, valid_global_rows, pad_sig)."""
        db = {k: batch[k] for k in self._DEVICE_KEYS if k in batch}
        db, valid, sig = pad_eval_batch(self.mesh, db)
        return shard_batch(self.mesh, db), valid, sig

    def _next_rng(self):
        self._eval_rng, sub = jax.random.split(self._eval_rng)
        return sub

    # -- Trainer hooks ----------------------------------------------------------------
    def train_step(self, batch, t_step, global_step, epoch, device_batch=None):
        tag = "TRAIN"
        step_fn = self._get_train_step()
        db = device_batch if device_batch is not None else self._device_batch(batch)
        self.state, losses, results = step_fn(self.state, db, self._next_rng())

        if self.is_master_process():
            if t_step % self.cfg.SYS.LOG_INTERVAL == 0:
                self.logger_writer_step(tag, losses, t_step, epoch, global_step)
            if t_step % self.result_saving_interval_train == 0:
                self._save_step_artifacts(tag, t_step, epoch, global_step, batch,
                                          results, save_npz=self.cfg.TRAIN.SAVE_NPZ,
                                          save_video=self.cfg.TRAIN.SAVE_VIDEO)

    def test_step(self, batch, t_step, epoch=0):
        tag = "TEST" if epoch == 0 else "VAL"
        assert isinstance(self.cfg.TEST.MULTIPLE, int) and self.cfg.TEST.MULTIPLE >= 1
        # true (unmultiplied, per-process) sample count of this batch — the
        # exact weight for the epoch loss sum (the reference weights every
        # batch by TEST.BATCH_SIZE, biasing the ragged last one; reference
        # voice2pose.py:380 note in SURVEY §3.2)
        true_bs = int(np.asarray(batch["audio"]).shape[0])
        if self.cfg.TEST.MULTIPLE > 1:
            batch = self.multiply_batch(batch, self.cfg.TEST.MULTIPLE)

        num_frames = int(np.asarray(batch["num_frames"])[0])
        t_mel = mel_frames_for_audio_length(batch["audio"].shape[-1])
        db, valid, sig = self._device_eval_batch(batch)
        step_fn = self._get_eval_step(num_frames, t_mel, valid, sig)
        losses, results = step_fn(self.state, db, self._next_rng(), None)

        if self.is_master_process():
            if t_step % self.cfg.SYS.LOG_INTERVAL == 0:
                self.logger_writer_step(tag, losses, t_step, epoch)
            if t_step % self.result_saving_interval_test == 0:
                self._save_step_artifacts(tag, t_step, epoch, None, batch, results,
                                          save_npz=self.cfg.TEST.SAVE_NPZ,
                                          save_video=self.cfg.TEST.SAVE_VIDEO)

        # losses are means over the global true rows; weight by the global
        # true sample count so the epoch ÷ num_test_samples is exact
        weight = true_bs * jax.process_count()
        batch_losses = {k: np.asarray(v) * weight for k, v in losses.items()}
        batch_results = {k: np.asarray(v) for k, v in results.items()
                         if k in ("mu_pred", "mu_gt", "logvar_pred", "logvar_gt",
                                  "condition_code") and v is not None}
        return batch_losses, batch_results

    def demo_step(self, batch, t_step, epoch=0, extra_id=None,
                  interpolation_coeff=None):
        tag = "DEMO"
        num_frames = int(np.asarray(batch["num_frames"])[0])
        if self.cfg.DEMO.SEQUENCE_PARALLEL:
            try:
                results = self._seq_parallel_demo_forward(batch, num_frames,
                                                          interpolation_coeff)
            except ValueError as e:
                # e.g. a clip too short for the mesh's halo widths — the dense
                # forward handles anything the sharded one can't
                logging.warning("DEMO.SEQUENCE_PARALLEL unavailable for this "
                                "clip (%s); using the dense forward", e)
                results = self._dense_demo_forward(batch, num_frames,
                                                   interpolation_coeff)
        elif (self.cfg.DEMO.WINDOWED
                and num_frames > self.cfg.DEMO.WINDOW_FRAMES):
            results = self._windowed_demo_forward(batch, num_frames,
                                                  interpolation_coeff)
        else:
            results = self._dense_demo_forward(batch, num_frames,
                                               interpolation_coeff)

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
                self.video_writer.save_video(
                    self.cfg, tag, vid, t_step, epoch, long_img=long_img,
                    audio=np.asarray(batch["audio"][0]), writer=self.tb_writer,
                    base_path=self.base_path, extra_id=extra_id)

    def _dense_demo_forward(self, batch, num_frames: int, interpolation_coeff):
        """Single-forward demo (the reference's only path, trainer.py:459-484);
        compiled once per (num_frames, t_mel).  Demo batches are size 1, so on
        a >1-device data mesh the batch is tiled to the mesh width (every
        device computes the same sample) and the results trimmed back.

        DEMO.LENGTH_BUCKET_S > 0 rounds the clip up to a length bucket, so a
        directory of N distinct clip lengths compiles a handful of executables
        instead of N.  The bucketed executable is LENGTH-POLYMORPHIC and exact:
        the clip's true (t_mel, num_frames) ride along as traced scalars, mel
        columns beyond them are masked, InstanceNorm statistics are computed
        over the valid prefix only, and every time resize builds its torch
        half-pixel grid in-jit from the traced lengths (ops/resize.py
        _dynamic_resize_matrix — still one MXU matmul).  The trimmed output
        equals an unbucketed compile to numerical precision
        (tests/test_demo_bucketing.py pins it)."""
        B = int(np.asarray(batch["audio"]).shape[0])
        orig_frames = num_frames
        batch, num_frames, valid_lens = self._bucket_demo_batch(batch, num_frames)
        n = self.mesh.size
        if n > 1 and B % n:
            batch = self.multiply_batch(batch, n)
        t_mel = mel_frames_for_audio_length(batch["audio"].shape[-1])
        step_fn = self._get_eval_step(num_frames, t_mel,
                                      length_poly=valid_lens is not None)
        db = self._device_batch(batch)
        coeff = (None if interpolation_coeff is None
                 else jnp.float32(interpolation_coeff))
        if valid_lens is None:
            _, results = step_fn(self.state, db, self._next_rng(), coeff)
        else:
            _, results = step_fn(self.state, db, self._next_rng(), coeff,
                                 None, valid_lens)
        if n > 1 and B % n:
            results = {k: (np.asarray(v)[:B] if v is not None
                           and np.ndim(v) >= 1 else v)
                       for k, v in results.items()}
        if num_frames != orig_frames:
            results = {k: (np.asarray(v)[:, :orig_frames]
                           if k in ("poses_pred_batch", "poses_gt_batch")
                           and v is not None else v)
                       for k, v in results.items()}
        return results

    def _bucket_demo_batch(self, batch, num_frames: int):
        """Pad a demo clip up to the next DEMO.LENGTH_BUCKET_S boundary
        (frame-aligned, parse_audio_length semantics) for the length-polymorphic
        eval step.  The first n_fft//2 pad samples REFLECT the clip's tail —
        exactly what the unbucketed mel's center padding reads there
        (ops/mel.py _frame_signal) — and the rest is silence, so mel columns
        below the clip's true t_mel are bit-equal to an unbucketed compile.

        Returns ``(batch, padded_frames, valid_lens)`` where ``valid_lens`` is
        the traced-scalar pair ``(t_mel_valid, num_frames_valid)``, or
        ``(batch, num_frames, None)`` when bucketing is off.  Skipped when GT
        poses or a frame-variant code ride along (their time axes would need
        the same treatment — dataset demo batches never carry them)."""
        bucket_s = float(self.cfg.DEMO.LENGTH_BUCKET_S or 0)
        cc = self.cfg.VOICE2POSE.GENERATOR.CLIP_CODE
        if bucket_s <= 0 or "poses" in batch or (self.has_code and cc.FRAME_VARIANT):
            return batch, num_frames, None
        fps = self.cfg.DATASET.FPS
        bucket_frames = max(1, int(round(bucket_s * fps)))
        padded = -(-num_frames // bucket_frames) * bucket_frames
        audio = np.asarray(batch["audio"])
        valid_lens = (np.int32(mel_frames_for_audio_length(audio.shape[-1])),
                      np.int32(num_frames))
        if padded == num_frames:
            return batch, num_frames, valid_lens
        target_len = int(padded * self.cfg.DATASET.AUDIO_SR / fps)
        assert target_len >= audio.shape[-1]
        L = audio.shape[-1]
        lead = [(0, 0)] * (audio.ndim - 1)
        reflect_n = min(target_len - L, 256, L - 1)  # n_fft//2 = 256
        audio = np.pad(audio, lead + [(0, reflect_n)], mode="reflect")
        audio = np.pad(audio, lead + [(0, target_len - L - reflect_n)])
        batch = dict(batch)
        batch["audio"] = audio
        batch["num_frames"] = np.full_like(np.asarray(batch["num_frames"]),
                                           padded)
        return batch, padded, valid_lens

    def _demo_code(self, batch, interpolation_coeff):
        """One style code for a whole long-form clip (fixed index + optional
        interpolation, or a random bank row) — per-window/per-shard sampling
        would flicker."""
        if not self.has_code:
            return None
        cfg_d = self.cfg.DEMO
        bank = self.state["clips_code"]
        if cfg_d.CODE_INDEX is not None:
            code = bank[cfg_d.CODE_INDEX]
            if interpolation_coeff is not None and cfg_d.CODE_INDEX_B is not None:
                code = (code * (1 - interpolation_coeff)
                        + bank[cfg_d.CODE_INDEX_B] * interpolation_coeff)
        else:
            idx = jax.random.randint(self._next_rng(), (), 0, bank.shape[0])
            code = bank[idx]
        return code

    def _seq_parallel_demo_forward(self, batch, num_frames: int,
                                   interpolation_coeff):
        """EXACT long-form demo: ONE generator forward with the time axis
        sharded over the data mesh (parallel/seqparallel.py) — halo-exchanged
        convs + psum'd InstanceNorm statistics reproduce the dense forward on
        the silence-padded audio, then the pad frames are trimmed.  No window
        crossfade, no 24 s cap (the reference's dense forward tops out at
        MAX_DEMO_LENGTH; DEMO.WINDOWED approximates per-window IN stats)."""
        from ..parallel.seqparallel import generator_seq_parallel

        if self.has_code and self.cfg.VOICE2POSE.GENERATOR.CLIP_CODE.FRAME_VARIANT:
            raise NotImplementedError(
                "DEMO.SEQUENCE_PARALLEL does not support FRAME_VARIANT clip "
                "codes (the per-frame code bank is train-length-shaped; "
                "use DEMO.WINDOWED)")
        n = self.mesh.size
        t_pad = -(-num_frames // (32 * n)) * (32 * n)
        audio = np.asarray(batch["audio"][0], np.float32)
        t_mel = -(-(len(audio) // 160 + 2) // (8 * n)) * (8 * n)
        audio_pad = np.zeros(((t_mel - 1) * 160,), np.float32)
        audio_pad[: len(audio)] = audio

        mel = np.asarray(mel_spectrogram(jnp.asarray(audio_pad[None]),
                                         impl=self.cfg.SYS.MEL_IMPL))
        code = self._demo_code(batch, interpolation_coeff)
        code_np = None if code is None else np.asarray(code)[None]

        pred = generator_seq_parallel(
            self.mesh, self.state["params_g"], mel, t_pad, code_np,
            leaky=self.cfg.VOICE2POSE.GENERATOR.LEAKY_RELU,
            num_landmarks=self.cfg.DATASET.NUM_LANDMARKS,
            norm=self.cfg.VOICE2POSE.GENERATOR.NORM,
            batch_stats=self.state.get("batch_stats_g") or None)
        pred = jnp.asarray(np.asarray(pred)[:, :num_frames])
        final = self._final_results(batch, pred)
        return {"poses_pred_batch": np.asarray(final),
                "condition_code": code_np}

    def _windowed_demo_forward(self, batch, num_frames: int, interpolation_coeff):
        """Long-form demo: slice audio into fixed train-shaped windows, run them as
        extra batch entries (so they shard over the data mesh like any batch), and
        crossfade-stitch the predictions (ops/longform.py).  One compiled graph
        serves every audio length — the TPU answer to the reference's dynamic
        F.interpolate forward and 24 s cap."""
        from ..ops.longform import stitch_windows, window_audio

        cfg_d = self.cfg.DEMO
        audio = np.asarray(batch["audio"][0])
        windows, plan = window_audio(audio, num_frames, cfg_d.WINDOW_FRAMES,
                                     cfg_d.HALO_FRAMES)
        n_real = len(windows)
        pad = (-n_real) % self.mesh.size
        if pad:
            windows = np.concatenate([windows, np.repeat(windows[-1:], pad, 0)])
        nw = len(windows)

        stat = batch["speaker_stat"]
        wbatch = {
            "audio": windows,
            "clip_index": np.zeros((nw,), np.int32),
            "speaker_stat": {k: np.repeat(np.asarray(v)[:1], nw, 0)
                             for k, v in stat.items()},
        }

        fixed_code = None
        if self.has_code:
            code = self._demo_code(batch, interpolation_coeff)
            fixed_code = jnp.broadcast_to(
                code[None], (nw,) + self.state["clips_code"].shape[1:])

        t_mel = mel_frames_for_audio_length(windows.shape[-1])
        step_fn = self._get_eval_step(cfg_d.WINDOW_FRAMES, t_mel)
        _, results = step_fn(self.state, self._device_batch(wbatch),
                             self._next_rng(), None, fixed_code)

        pred = np.asarray(results["poses_pred_batch"])[:n_real]
        stitched = stitch_windows(pred, plan, num_frames, cfg_d.HALO_FRAMES)
        return {"poses_pred_batch": stitched[None],
                "condition_code": (None if fixed_code is None
                                   else np.asarray(fixed_code[:1]))}

    # -- epoch metrics / figures -------------------------------------------------------
    def evaluate_epoch(self, results_dict):
        tic = time.time()
        metrics = {}
        if "mu_pred" in results_dict:
            metrics["FGD_mu"] = compute_fgd(results_dict["mu_pred"],
                                            results_dict["mu_gt"])
            metrics["FGD_mu_logvar"] = compute_fgd(
                np.concatenate([results_dict["mu_pred"],
                                results_dict["logvar_pred"]], axis=1),
                np.concatenate([results_dict["mu_gt"],
                                results_dict["logvar_gt"]], axis=1))
        logging.info("Complete epoch evaluation in %.2f min",
                     (time.time() - tic) / 60)
        return metrics

    def draw_figure_epoch(self):
        fig_dict = {}
        msg = "[TRAIN] epoch plotting: "
        if self.has_code and "clips_code" in self.state:
            import matplotlib

            matplotlib.use("Agg")
            from matplotlib import pyplot as plt

            code = np.asarray(self.state["clips_code"])
            if code.ndim == 3:
                code = code.transpose(0, 2, 1).reshape(-1, code.shape[1])
            fig = plt.figure()
            xy = _pca_2d(code)
            plt.scatter(xy[:, 0], xy[:, 1], alpha=0.2, edgecolors="none", s=1)
            fig.tight_layout()
            fig_dict["clip_code"] = fig
            plt.close()
            msg += "Clip Code, "
        logging.info(msg)
        return fig_dict

    # -- host-side artifact saving ------------------------------------------------------
    def _save_step_artifacts(self, tag, t_step, epoch, global_step, batch, results,
                             save_npz: bool, save_video: bool):
        if not (save_npz or save_video):
            # nothing to save — above all, do NOT fetch: pulling the full
            # result arrays through a remote-device tunnel costs ~0.9 s per
            # call and was measured to dominate the production train wall
            # (docs/PERF.md "Production workflow", round 5)
            return
        # one batched fetch instead of a per-array np.asarray round-trip
        np_results = jax.device_get(
            {k: v for k, v in results.items() if v is not None})
        if save_npz:
            self.save_results(tag, t_step, epoch, self.base_path, np_results)
        if save_video:
            pred = np_results["poses_pred_batch"][0]
            gt = np_results["poses_gt_batch"][0]
            vid = self.generate_video_pair(pred, gt)
            self.video_writer.save_video(
                self.cfg, tag, vid, t_step, epoch, global_step,
                audio=np.asarray(batch["audio"][0]), writer=self.tb_writer,
                base_path=self.base_path)

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


def _pca_2d(x: np.ndarray) -> np.ndarray:
    """2-component PCA via SVD (replaces sklearn.decomposition.PCA in the reference's
    epoch figure, voice2pose.py:479-510)."""
    x = x - x.mean(axis=0, keepdims=True)
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    return x @ vt[:2].T

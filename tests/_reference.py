"""Harness for importing and running the reference torch pipelines on CPU.

The reference (/root/reference, read-only) assumes CUDA and some packages this
image lacks (torchaudio, librosa, ffmpeg-python).  This module installs:
  - import stubs: ``torchaudio.transforms.MelSpectrogram`` is replaced by an
    exact CPU oracle (torch.stft power spectrum x our golden-tested mel
    filterbank — the same computation torchaudio performs with the reference's
    parameters win=400/hop=160/nfft=512/fmin=55/fmax=7500/nmels=80);
  - ``.cuda()`` no-op patches on Tensor/Module so the reference's hardcoded
    device moves run on CPU.

Used by the train-step parity tests (round-2 verdict item 1): they build the
reference ``Voice2PoseModel``/``Pose2PoseModel``, transplant weights into our
Flax modules, run ONE reference optimization step exactly as
``core/pipelines/voice2pose.py:297-309`` / ``pose2pose.py:126-137`` do, and
compare against our jitted step.
"""

from __future__ import annotations

import sys
import types

REFERENCE = "/root/reference"


def _stub(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


def install_reference_stubs():
    """Idempotently install import stubs + cuda no-ops; returns torch."""
    import torch

    if "torchaudio" not in sys.modules:
        import numpy as np

        from speechdrivestemplates_tpu.ops.mel import mel_filterbank

        class MelSpectrogram(torch.nn.Module):
            """Oracle reproducing torchaudio.transforms.MelSpectrogram for the
            reference's fixed parameters (voice2pose.py:27-30)."""

            def __init__(self, win_length=400, hop_length=160, n_fft=512,
                         f_min=55, f_max=7500.0, n_mels=80):
                super().__init__()
                assert (win_length, hop_length, n_fft, n_mels) == (400, 160, 512, 80)
                self.register_buffer("window", torch.hann_window(400, periodic=True))
                self.register_buffer("fb", torch.from_numpy(
                    np.asarray(mel_filterbank(), dtype=np.float32)))

            def forward(self, x):
                spec = torch.stft(x, n_fft=512, hop_length=160, win_length=400,
                                  window=self.window, center=True,
                                  pad_mode="reflect", normalized=False,
                                  onesided=True, return_complex=True)
                power = spec.real ** 2 + spec.imag ** 2
                return torch.matmul(power.transpose(-1, -2),
                                    self.fb).transpose(-1, -2)

        ta = _stub("torchaudio")
        tr = _stub("torchaudio.transforms")
        tr.MelSpectrogram = MelSpectrogram
        ta.transforms = tr

    for missing in ("librosa", "ffmpeg"):
        if missing not in sys.modules:
            try:
                __import__(missing)
            except ImportError:
                _stub(missing)

    # .cuda() no-ops (reference hardcodes device moves)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    # numpy 2.x removed the np.float alias (it was builtin float); the
    # reference's era-numpy code uses it in denormalize_poses /
    # transform_normalized_parted2global (gesture_dataset.py:195-196) —
    # restore the exact historical aliasing so the UNMODIFIED reference runs
    import numpy as _np

    if not hasattr(_np, "float"):
        _np.float = float  # noqa: NPY201 — deliberate compat shim

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    return torch


def reference_voice2pose_step(model, optimizers, batch, dataset=None):
    """One reference Voice2Pose optimization step, verbatim semantics of
    core/pipelines/voice2pose.py:283-309 (sans logging/eval):
    zero grads -> G_loss.backward(retain_graph=True) -> ClipCode step -> G step
    -> D zero grad -> D_loss.backward -> D step.  ``dataset`` is only
    consulted by non-hierarchical configs (p2g renorm for the FGD encoder,
    reference voice2pose.py:165-170) — pass the reference GestureDataset
    there."""
    losses_dict, results_dict = model(batch, dataset)
    losses_dict = {k: v.mean() for k, v in losses_dict.items()}

    if "optimizerClipCode" in optimizers:
        optimizers["optimizerClipCode"].zero_grad()
    optimizers["optimizerG"].zero_grad()
    losses_dict["G_loss"].backward(
        retain_graph="optimizerD_pose" in optimizers)
    if "optimizerClipCode" in optimizers:
        optimizers["optimizerClipCode"].step()
    optimizers["optimizerG"].step()

    if "optimizerD_pose" in optimizers:
        optimizers["optimizerD_pose"].zero_grad()
        losses_dict["D_pose_gan_loss"].backward()
        optimizers["optimizerD_pose"].step()
    return losses_dict, results_dict


def reference_pose2pose_step(model, optimizer, batch):
    """One reference Pose2Pose optimization step (pose2pose.py:126-150):
    forward -> bank scatter at clip indices -> zero grad -> loss.backward ->
    step."""
    losses_dict, results_dict = model(batch)
    losses_dict = {k: v.mean() for k, v in losses_dict.items()}

    clip_indices = batch["clip_index"]
    model.clip_code_mu[clip_indices] = results_dict["clip_code_mu"].detach()
    model.clip_code_logvar[clip_indices] = results_dict["clip_code_logvar"].detach()

    optimizer.zero_grad()
    losses_dict["loss"].backward()
    optimizer.step()
    return losses_dict, results_dict


def reference_voice2pose_eval(model, dataset, batch, test_batch_size):
    """One reference TEST step, verbatim semantics of
    core/pipelines/voice2pose.py:333-384 + evaluate_step (:412-430), sans
    logging/saving: eval-mode forward, denormalize through the reference
    dataset, L2/lip-sync metrics, losses x TEST.BATCH_SIZE, and the
    mu/logvar/condition_code rows kept for the epoch FGD."""
    import numpy as np
    import torch

    was_training = model.training
    model.eval()
    with torch.no_grad():
        losses_dict, results_dict = model(batch, dataset)
        speaker_stat = batch["speaker_stat"]
        results_dict["poses_pred_batch"] = dataset.get_final_results(
            results_dict["poses_pred_batch"].detach(), speaker_stat)
        results_dict["poses_gt_batch"] = dataset.get_final_results(
            results_dict["poses_gt_batch"].detach(), speaker_stat)

        pred = results_dict["poses_pred_batch"]
        gt = results_dict["poses_gt_batch"]
        L2_dist = torch.norm(pred - gt, p=2, dim=2)
        lip_open_pred = torch.norm(pred[:, :, :, 75] - pred[:, :, :, 71],
                                   p=2, dim=-1)
        lip_open_gt = torch.norm(gt[:, :, :, 75] - gt[:, :, :, 71],
                                 p=2, dim=-1)
        denom = lip_open_gt.max(-1, keepdim=True).values + 1e-4
        losses_dict["L2_dist"] = L2_dist.mean()
        losses_dict["lip_sync_error_n"] = torch.abs(
            lip_open_pred / denom - lip_open_gt / denom).mean()
        losses_dict = {k: v.mean() for k, v in losses_dict.items()}
    if was_training:
        model.train()

    batch_losses = {k: float(v.detach()) * test_batch_size
                    for k, v in losses_dict.items()}
    batch_results = {
        k: np.asarray(v.detach()) for k, v in results_dict.items()
        if k in ("mu_pred", "mu_gt", "logvar_pred", "logvar_gt",
                 "condition_code") and v is not None}
    return batch_losses, batch_results


def reference_pose2pose_eval(model, dataset, batch, test_batch_size):
    """One reference Pose2Pose TEST step, verbatim semantics of
    core/pipelines/pose2pose.py:172-218 + evaluate (:248-280), sans
    logging/saving (TEST.MULTIPLE == 1 path).  The VAE eval forward still
    reparameterizes — pin torch.randn before calling for determinism."""
    import torch

    was_training = model.training
    model.eval()
    with torch.no_grad():
        losses_dict, results_dict = model(batch, is_testing=True)
        speaker_stat = batch["speaker_stat"]
        results_dict["poses_pred_batch"] = dataset.get_final_results(
            results_dict["poses_pred_batch"].detach(), speaker_stat)
        results_dict["poses_gt_batch"] = dataset.get_final_results(
            results_dict["poses_gt_batch"].detach(), speaker_stat)

        pred = results_dict["poses_pred_batch"]
        gt = results_dict["poses_gt_batch"]
        L2_dist = torch.norm(pred - gt, p=2, dim=2)
        lip_open_pred = torch.sqrt(
            ((pred[:, :, :, 75] - pred[:, :, :, 71]) ** 2).sum(dim=2))
        lip_open_gt = torch.sqrt(
            ((gt[:, :, :, 75] - gt[:, :, :, 71]) ** 2).sum(dim=2))
        denom = lip_open_gt.max(-1, keepdim=True).values + 1e-4
        losses_dict["L2_dist"] = L2_dist
        losses_dict["lip_sync_error_n"] = torch.abs(
            lip_open_pred / denom - lip_open_gt / denom)
        losses_dict = {k: v.mean() for k, v in losses_dict.items()}
    if was_training:
        model.train()
    return {k: float(v.detach()) * test_batch_size
            for k, v in losses_dict.items()}

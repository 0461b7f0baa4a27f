"""Training engine: experiment lifecycle, loops, logging, checkpointing.

Mirrors the surface of the reference's abstract ``Trainer``
(``core/pipelines/trainer.py:19-484``): ``train(cfg, exp_tag, resume_from)``,
``test(cfg, exp_tag, checkpoint)``, ``demo(cfg, exp_tag, checkpoint, demo_input)``,
per-split dataset setup, datetime-tagged experiment directories, resume/pretrain/eval
checkpoint semantics, TensorBoard + file logging, and master-process-only I/O.

TPU-era differences (by design, not omission):
  - One process drives all local devices; "rank 0" gating becomes
    ``jax.process_index() == 0`` (multi-host).  DistributedSampler is replaced by the
    loader's per-process sharding.
  - Checkpoints are orbax directories (``checkpoint_epoch-E_step-S/``) holding the
    whole train-state pytree + a small metadata dict, rather than torch .pth pickles.
    Resume restores model params, every optimizer state, and the epoch/step counters
    and reuses the original experiment directory (reference trainer.py:172-184).
  - Loss reduction across devices is implicit: metrics computed inside the jitted
    step are means over the *global* (sharded) batch, so ``reduce_tensor_dict``
    (reference trainer.py:323-327) has no equivalent work to do.
"""

from __future__ import annotations

import logging
import os
import re
import time
from abc import abstractmethod
from datetime import datetime
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..datasets import DataLoader, get_dataset
from ..parallel import get_data_mesh, is_master_process, process_count, process_index
from ..utils.video import VideoWriter


def _to_host_scalar(v) -> float:
    return float(np.asarray(v))


def restructure_like(template: Any, raw: Any) -> Any:
    """Rebuild a pytree with ``template``'s structure (NamedTuples, tuples, dicts)
    from orbax's raw dict-of-dicts restore.  Orbax serializes NamedTuples as dicts
    keyed by field name and tuples/lists as dicts keyed by '0','1',...; a raw
    restore therefore loses the optax state types this key-based walk restores."""
    if hasattr(template, "_fields"):  # NamedTuple (optax states)
        return type(template)(**{
            f: restructure_like(getattr(template, f), raw[f])
            for f in template._fields})
    if isinstance(template, (tuple, list)):
        vals = [restructure_like(t, raw[str(i)] if isinstance(raw, dict) else raw[i])
                for i, t in enumerate(template)]
        return type(template)(vals) if isinstance(template, list) else tuple(vals)
    if isinstance(template, dict) or hasattr(template, "items"):
        return {k: restructure_like(v, raw[k]) for k, v in template.items()}
    if raw is None:
        return template
    import jax.numpy as jnp

    arr = jnp.asarray(raw)
    return arr.astype(template.dtype) if hasattr(template, "dtype") else arr


class Trainer:
    def __init__(self, cfg) -> None:
        self.cfg = cfg
        self.optimizers: Dict[str, Any] = {}
        self.train_dataloader = None
        self.test_dataloader = None
        self.tb_writer = None
        self.mesh = get_data_mesh(cfg.SYS.MESH.DATA)

    # -- identity ---------------------------------------------------------------
    def get_rank(self) -> int:
        return process_index()

    def get_world_size(self) -> int:
        return process_count()

    def is_master_process(self) -> bool:
        return is_master_process()

    # -- logging ------------------------------------------------------------------
    def setup_logger(self, base_path: str, exp_name: str) -> None:
        root = logging.getLogger()
        root.setLevel(logging.INFO)
        fmt = logging.Formatter("%(asctime)s [%(levelname)-0.5s] %(message)s")
        log_path = os.path.join(base_path, f"{exp_name}.log")
        fh = logging.FileHandler(log_path)
        fh.setFormatter(fmt)
        root.addHandler(fh)
        ch = logging.StreamHandler()
        ch.setFormatter(fmt)
        root.addHandler(ch)
        logging.info("log path: %s", log_path)

    # -- data ---------------------------------------------------------------------
    def setup_dataset(self, cfg, split: str, demo_input: Optional[str] = None) -> None:
        if self.is_master_process():
            print("Setting up dataset...")
        ds_cls = get_dataset(cfg.DATASET.NAME)
        nshards, shard = self.get_world_size(), self.get_rank()

        if split == "train":
            self.train_dataset = ds_cls(
                cfg.DATASET.ROOT_DIR, cfg.DATASET.SPEAKER, "train", cfg)
            self.train_dataloader = DataLoader(
                self.train_dataset, batch_size=cfg.TRAIN.BATCH_SIZE // nshards,
                shuffle=True, drop_last=True, seed=cfg.SYS.SEED,
                num_shards=nshards, shard_index=shard,
                num_workers=cfg.SYS.NUM_WORKERS)
            self.num_train_samples = len(self.train_dataset)
            self.num_train_batches = len(self.train_dataloader)
            self.result_saving_interval_train = max(
                1, self.num_train_batches // cfg.TRAIN.NUM_RESULT_SAMPLE)
            if self.is_master_process():
                print("num_train_samples: %d" % self.num_train_samples)

            if cfg.TRAIN.VALIDATE:
                self._setup_eval_split(cfg, nshards, shard)

        elif split == "test":
            self.num_train_samples = None
            self._setup_eval_split(cfg, nshards, shard)

        elif split == "demo":
            self.num_train_samples = None
            self.test_dataset = ds_cls(
                cfg.DATASET.ROOT_DIR, cfg.DATASET.SPEAKER, "demo", cfg,
                demo_input=demo_input)
            self.test_dataloader = DataLoader(self.test_dataset, batch_size=1)
            self.num_test_samples = len(self.test_dataset)
            self.num_test_batches = len(self.test_dataloader)
            self.result_saving_interval_test = max(
                1, self.num_test_batches // cfg.TEST.NUM_RESULT_SAMPLE)
            if self.is_master_process():
                print("num_test_samples: %d" % self.num_test_samples)
        else:
            raise Exception("Unknown data split.")

    def _setup_eval_split(self, cfg, nshards: int, shard: int) -> None:
        ds_cls = get_dataset(cfg.DATASET.NAME)
        self.test_dataset = ds_cls(
            cfg.DATASET.ROOT_DIR, cfg.DATASET.SPEAKER, "val", cfg)
        self.test_dataloader = DataLoader(
            self.test_dataset, batch_size=cfg.TEST.BATCH_SIZE // nshards,
            shuffle=False, num_shards=nshards, shard_index=shard)
        self.num_test_samples = len(self.test_dataset)
        self.num_test_batches = len(self.test_dataloader)
        self.result_saving_interval_test = max(
            1, self.num_test_batches // cfg.TEST.NUM_RESULT_SAMPLE)
        if self.is_master_process():
            print("num_val_samples: %d" % self.num_test_samples)

    # -- model/optimizer hooks (implemented by pipelines) -------------------------
    @abstractmethod
    def setup_model(self, cfg, state_dict=None):
        ...

    @abstractmethod
    def setup_optimizer(self, checkpoint=None, last_epoch: int = -1):
        ...

    @abstractmethod
    def train_step(self, batch, t_step, global_step, epoch):
        ...

    @abstractmethod
    def test_step(self, batch, t_step, epoch=0):
        ...

    @abstractmethod
    def demo_step(self, batch, t_step, epoch=0, extra_id=None, interpolation_coeff=None):
        ...

    def evaluate_epoch(self, results_dict):
        return {}

    def draw_figure_epoch(self):
        return {}

    # -- checkpointing ----------------------------------------------------------
    def state_to_save(self) -> Dict[str, Any]:
        """Pipelines return the full pytree (params + optimizer states) to persist."""
        raise NotImplementedError

    def load_state(self, tree: Dict[str, Any], load_optimizers: bool) -> None:
        raise NotImplementedError

    def save_checkpoint(self, epoch: int, global_step: int) -> None:
        import orbax.checkpoint as ocp

        checkpoint_dir = os.path.join(self.base_path, "checkpoints")
        os.makedirs(checkpoint_dir, exist_ok=True)
        path = os.path.abspath(os.path.join(
            checkpoint_dir, f"checkpoint_epoch-{epoch}_step-{global_step}"))
        logging.info("Saving checkpoint to: %s", path)
        tree = {"epoch": epoch, "step": global_step, "state": self.state_to_save()}
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, tree, force=True)
        ckptr.wait_until_finished()

    @staticmethod
    def _checkpoint_key(name: str):
        """(epoch, step) parsed from a ``checkpoint_epoch-E_step-S`` name;
        (-1, -1) for anything unparseable (sorts last)."""
        try:
            return (int(name.split("epoch-")[1].split("_")[0]),
                    int(name.split("step-")[1]))
        except (IndexError, ValueError):
            return (-1, -1)

    @staticmethod
    def resolve_checkpoint(path: str) -> str:
        """Accept a checkpoint dir, an experiment dir, or a checkpoints/ dir and
        return the newest checkpoint (latest (epoch, step) parsed from the name).
        Convenience over the reference's exact-path-only --resume_from."""
        path = os.path.abspath(path)
        if os.path.basename(path).startswith("checkpoint_"):
            return path
        cand = path
        if os.path.isdir(os.path.join(path, "checkpoints")):
            cand = os.path.join(path, "checkpoints")
        entries = [e for e in os.listdir(cand) if e.startswith("checkpoint_")]
        if not entries:
            raise FileNotFoundError(
                f"no checkpoint_* entries under {cand!r} (from {path!r}); "
                "pass a checkpoint directory, an experiment directory, or a "
                "checkpoints/ directory")
        return os.path.join(cand, max(entries, key=Trainer._checkpoint_key))

    @staticmethod
    def find_auto_resume_candidates(root: str, exp_tag: str) -> list:
        """Every checkpoint across every experiment directory created for this
        ``exp_tag`` (dirs are named ``<datetime>_<exp_tag>``), newest
        (epoch, step) first.  Callers try them in order so a truncated save
        (non-atomic filesystem + preemption mid-write) falls back to the
        previous good checkpoint instead of crash-looping."""
        if not os.path.isdir(root):
            return []
        # dirs are '<datetime>_<exp_tag>' with datetime =
        # 'YYYY-MM-DD_HH-MM-SS-micros' (setup_experiment); require EXACT tag
        # equality after the datetime — endswith('_'+tag) would also resume
        # from e.g. 'my_run' when our tag is 'run'.
        dt_re = re.compile(r"^\d{4}-\d{2}-\d{2}_\d{2}-\d{2}-\d{2}(-\d+)?_")
        found = []
        for d in sorted(os.listdir(root)):
            m = dt_re.match(d)
            if not m or d[m.end():] != exp_tag:
                continue
            ckdir = os.path.join(root, d, "checkpoints")
            if not os.path.isdir(ckdir):
                continue
            for e in os.listdir(ckdir):
                if (e.startswith("checkpoint_")
                        and Trainer._checkpoint_key(e) >= (0, 0)):
                    found.append((Trainer._checkpoint_key(e),
                                  os.path.join(ckdir, e)))
        return [p for _, p in sorted(found, reverse=True)]

    @staticmethod
    def find_auto_resume(root: str, exp_tag: str) -> Optional[str]:
        """Newest checkpoint for this ``exp_tag``, or None when no prior run
        left one.  Powers ``TRAIN.AUTO_RESUME`` — the restart story for
        preemptible jobs (the reference's recovery is a manual
        ``--resume_from``, reference trainer.py:172-184)."""
        cands = Trainer.find_auto_resume_candidates(root, exp_tag)
        return cands[0] if cands else None

    @staticmethod
    def load_checkpoint_tree(path: str) -> Dict[str, Any]:
        import orbax.checkpoint as ocp

        path = Trainer.resolve_checkpoint(path)
        assert os.path.exists(path), f"checkpoint not found: {path}"
        with ocp.PyTreeCheckpointer() as ckptr:
            return ckptr.restore(path)

    @staticmethod
    def _is_torch_pth(path: Optional[str]) -> bool:
        return path is not None and path.endswith((".pth", ".pt"))

    def load_torch_pth(self, path: str) -> None:
        """Map a reference-format PyTorch checkpoint (.pth, the files the
        reference publishes for every subject) onto this pipeline's state in
        place: model weights, BN running stats, and template code banks.
        Overridden per pipeline (utils/torch_import translators).  Optimizer
        moments are torch-format and are NOT imported — so a .pth works for
        --checkpoint / --pretrain_from / --export, not --resume_from."""
        raise NotImplementedError(
            f"{type(self).__name__} has no PyTorch checkpoint importer")

    def _load_model_weights(self, path: str) -> None:
        """Model-weights-only load (no optimizer state), format-dispatched:
        a reference ``.pth`` goes through the per-pipeline importer, anything
        else is an orbax tree.  Shared by --pretrain_from and the eval/demo
        --checkpoint branch."""
        if self._is_torch_pth(path):
            self.setup_model(self.cfg)
            self.load_torch_pth(path)
        else:
            tree = self.load_checkpoint_tree(path)
            self.setup_model(self.cfg)
            self.load_state(tree["state"], load_optimizers=False)

    # -- experiment lifecycle ------------------------------------------------------
    def setup_experiment(self, is_training: bool, exp_tag: str,
                         resume_from: Optional[str] = None,
                         checkpoint: Optional[str] = None,
                         demo_input: Optional[str] = None):
        if self.is_master_process():
            print("Setting up base directory...")
        if is_training and resume_from is None and self.cfg.TRAIN.AUTO_RESUME:
            # restartable (preemptible) jobs: pick up this tag's newest
            # RESTORABLE checkpoint automatically instead of requiring
            # --resume_from.  A preemption mid-save on a non-atomic filesystem
            # (gcsfuse/NFS) can leave a final-named but truncated checkpoint;
            # probing with a real restore and falling back to the next-newest
            # one keeps the restart loop alive instead of crash-looping on it.
            for cand in self.find_auto_resume_candidates(
                    self.cfg.SYS.OUTPUT_DIR, exp_tag):
                try:
                    # cache the probe so the resume branch below doesn't
                    # restore the same tree a second time
                    self._probed_checkpoint = (cand, self.load_checkpoint_tree(cand))
                except Exception as exc:  # noqa: BLE001 — any restore failure
                    if self.is_master_process():
                        print("AUTO_RESUME: skipping unrestorable checkpoint "
                              "%s (%s)" % (cand, exc))
                    continue
                resume_from = cand
                break
            if resume_from and self.is_master_process():
                print("AUTO_RESUME: continuing from %s" % resume_from)
        dt = str(datetime.now()).replace(".", "-").replace(":", "-").replace(" ", "_")
        exp_tag = "_".join([dt, exp_tag])

        if is_training:
            self.setup_dataset(self.cfg, "train")

            if resume_from is not None:
                assert os.path.exists(resume_from), f"not found: {resume_from}"
                if self._is_torch_pth(resume_from):
                    raise ValueError(
                        "--resume_from needs optimizer state, which a "
                        "PyTorch .pth cannot provide across frameworks; use "
                        "--pretrain_from %s to continue from its model "
                        "weights with fresh optimizers" % resume_from)
                resume_from = self.resolve_checkpoint(resume_from)
                if self.is_master_process():
                    print("Resuming from checkpoint: %s" % resume_from)
                probed = getattr(self, "_probed_checkpoint", None)
                if probed is not None and probed[0] == resume_from:
                    tree = probed[1]
                    self._probed_checkpoint = None
                else:
                    tree = self.load_checkpoint_tree(resume_from)
                epoch = int(tree["epoch"])
                global_step = int(tree["step"])
                # reuse the original experiment dir (reference trainer.py:178-180)
                base_path = os.path.dirname(os.path.dirname(os.path.abspath(resume_from)))
                self.setup_model(self.cfg)
                self.setup_optimizer(last_epoch=epoch)
                self.load_state(tree["state"], load_optimizers=True)
            else:
                epoch = 0
                global_step = 0
                base_path = os.path.join(self.cfg.SYS.OUTPUT_DIR, exp_tag)
                if self.is_master_process():
                    os.makedirs(base_path)

                if self.cfg.TRAIN.PRETRAIN_FROM is not None:
                    pretrain_from = self.cfg.TRAIN.PRETRAIN_FROM
                    assert os.path.exists(pretrain_from), f"not found: {pretrain_from}"
                    if self.is_master_process():
                        print("Loading from pretrained model: %s" % pretrain_from)
                    # model weights only, exactly the reference's
                    # --pretrain_from semantics (reference trainer.py:198-200)
                    self._load_model_weights(pretrain_from)
                else:
                    self.setup_model(self.cfg)
                self.setup_optimizer()
            return base_path, epoch, global_step
        else:
            if demo_input is None:
                self.setup_dataset(self.cfg, "test")
            else:
                self.setup_dataset(self.cfg, "demo", demo_input=demo_input)

            base_path = os.path.join(self.cfg.SYS.OUTPUT_DIR, exp_tag)
            if self.is_master_process():
                os.makedirs(base_path)

            if checkpoint is not None:
                print("Loading from checkpoint: %s" % checkpoint)
                # a trained reference checkpoint evaluates / demos directly
                # (reference trainer.py:215-221 is .pth-only; here both
                # formats work)
                self._load_model_weights(checkpoint)
            else:
                raise Exception("Checkpoint file is not provided.")
            return base_path

    # -- step/epoch logging --------------------------------------------------------
    def logger_writer_step(self, tag, losses, step, epoch=None, global_step=None):
        step_toc = (time.time() - self.step_tic) / self.cfg.SYS.LOG_INTERVAL
        self.step_tic = time.time()

        if tag == "TRAIN":
            msg = "[%s] epoch: %d/%d  step: %d/%d  global_step: %d  time: %.3f  " % (
                tag, epoch, self.cfg.TRAIN.NUM_EPOCHS, step, self.num_train_batches,
                global_step, step_toc)
            for k, lr in self.current_lrs().items():
                msg += "lr_%s: %.1e  " % (k, lr)
                if self.tb_writer:
                    self.tb_writer.add_scalar(f"train/lr_{k}", lr, global_step)
            for k, v in losses.items():
                val = _to_host_scalar(v)
                msg += "%s: %.5f  " % (k, val)
                if self.tb_writer:
                    self.tb_writer.add_scalar(f"train/{k}", val, global_step)
        elif tag in ("VAL", "TEST"):
            msg = "[%s] epoch: %d/%d  step: %d/%d  time: %.3f  " % (
                tag, epoch, self.cfg.TRAIN.NUM_EPOCHS, step,
                self.num_test_batches, step_toc)
            msg += "".join("%s: %.5f  " % (k, _to_host_scalar(v))
                           for k, v in losses.items())
        else:
            raise Exception("Unknown tag: %s" % tag)
        logging.info(msg)

    def logger_writer_epoch(self, tag, epoch_toc, losses=None, figures=None,
                            epoch=0, ETA=None):
        if tag == "TRAIN":
            msg = "[TRAIN] epoch_time: %.2f hours  ETA: %.2f hours" % (epoch_toc, ETA)
            if self.tb_writer:
                self.tb_writer.add_scalar("train/epoch_time", epoch_toc, global_step=epoch)
                self.tb_writer.add_scalar("train/ETA", ETA, global_step=epoch)
                for k, v in (figures or {}).items():
                    self.tb_writer.add_figure(f"{tag.lower()}/{k}", v, global_step=epoch)
        elif tag in ("VAL", "TEST"):
            epoch_counter = ("epoch: %d/%d  " % (epoch, self.cfg.TRAIN.NUM_EPOCHS)
                             if tag == "VAL" else "")
            msg = "[%s] %sval_time: %.1f min  num_samples: %d  " % (
                tag, epoch_counter, epoch_toc, self.num_test_samples)
            for k, v in (losses or {}).items():
                val = _to_host_scalar(v)
                msg += "%s: %.5f  " % (k, val)
                if self.tb_writer:
                    self.tb_writer.add_scalar(f"{tag.lower()}/{k}", val, global_step=epoch)
        elif tag == "DEMO":
            msg = "[%s] time: %.1f min  num_samples: %d  " % (
                tag, epoch_toc, self.num_test_samples)
        else:
            raise Exception("Unknown tag: %s" % tag)
        logging.info(msg)

    def current_lrs(self) -> Dict[str, float]:
        """Pipelines report their current learning rates for logging."""
        return {}

    # -- tensor-dict helpers (reference trainer.py:329-353) -------------------------
    @staticmethod
    def concat_tensor_dict(input_dict, collection_dict):
        for k, v in input_dict.items():
            v = np.asarray(v)
            if k not in collection_dict:
                collection_dict[k] = v
            else:
                collection_dict[k] = np.concatenate([collection_dict[k], v], axis=0)
        return collection_dict

    @staticmethod
    def multiply_batch(batch, multiple: int):
        """Repeat a batch ``multiple`` times along the leading axis
        (reference mutiply_batch, trainer.py:343-353)."""
        if isinstance(batch, dict):
            return {k: Trainer.multiply_batch(v, multiple) for k, v in batch.items()}
        if isinstance(batch, list):
            return batch * multiple
        arr = np.asarray(batch)
        return np.tile(arr[None], (multiple,) + (1,) * arr.ndim).reshape(
            (multiple * arr.shape[0],) + arr.shape[1:])

    # -- main entries ---------------------------------------------------------------
    def train(self, cfg, exp_tag, resume_from):
        self.base_path, epoch, global_step = self.setup_experiment(
            True, exp_tag, resume_from=resume_from)

        if self.is_master_process():
            print("Setting up logger and summary writer...")
            self.setup_logger(self.base_path, exp_tag)
            self.tb_writer = _make_tb_writer(self.base_path)
            self.video_writer = VideoWriter(self.cfg)
            logging.info("\n====== Configurations ======\n%s\n============\n", str(cfg))
            logging.info("Training begins!")

        # Preemption notice (SIGTERM): finish the in-flight step, checkpoint,
        # exit 143.  The save is stamped (epoch-1, global_step) so a resume
        # redoes the interrupted epoch from its (deterministically shuffled)
        # start — at most one epoch of work repeats, none is lost.  Pairs with
        # TRAIN.AUTO_RESUME; the reference's only recovery is a manual
        # --resume_from of an epoch-boundary checkpoint (trainer.py:172-184).
        self._preempted = False
        old_sigterm = None
        if cfg.TRAIN.CHECKPOINT_ON_PREEMPT:
            import signal

            def _on_sigterm(signum, frame):
                self._preempted = True
                logging.warning("SIGTERM received — will checkpoint after the "
                                "in-flight step and exit")

            try:
                old_sigterm = signal.signal(signal.SIGTERM, _on_sigterm)
            except ValueError:  # non-main thread (e.g. driven from tests)
                old_sigterm = None

        epoch_toc_list = []
        while epoch < cfg.TRAIN.NUM_EPOCHS:
            epoch += 1
            epoch_tic = time.time()
            self.step_tic = time.time()
            self.train_dataloader.set_epoch(epoch)
            chunk_cache = self._chunk_cache_or_none(cfg)
            if chunk_cache is not None:
                global_step = self._train_epoch_chunked(
                    cfg, epoch, global_step, chunk_cache)
            else:
                for t_step, (batch, db) in enumerate(
                        self._device_prefetch(self.train_dataloader)):
                    global_step += 1
                    self._maybe_profile(cfg, global_step)
                    self.train_step(batch, t_step + 1, global_step, epoch,
                                    device_batch=db)
                    if self._preempt_agreed(cfg):
                        self.save_checkpoint(epoch - 1, global_step)
                        logging.warning(
                            "Preemption checkpoint saved (epoch %d, step %d); "
                            "exiting 143", epoch - 1, global_step)
                        raise SystemExit(143)

            if epoch % cfg.TRAIN.CHECKPOINT_INTERVAL == 0:
                # orbax saves are process-collective (unlike torch.save, which the
                # reference gates on rank 0 — trainer.py:389-391): every host calls in.
                self.save_checkpoint(epoch, global_step)
                if cfg.TRAIN.VALIDATE:
                    self.validate(self.test_dataloader, epoch)

            self.on_epoch_end(epoch)
            epoch_toc = (time.time() - epoch_tic) / 3600
            epoch_toc_list.append(epoch_toc)
            recent = epoch_toc_list[-10:]
            ETA = (cfg.TRAIN.NUM_EPOCHS - epoch) * (sum(recent) / len(recent))
            if self.is_master_process():
                fig_dict = self.draw_figure_epoch()
                self.logger_writer_epoch("TRAIN", epoch_toc, epoch=epoch, ETA=ETA,
                                         figures=fig_dict)

        if getattr(self, "_profiling", False):
            # window extended past the last step — close the trace anyway
            jax.profiler.stop_trace()
            self._profiling = False

        if old_sigterm is not None:
            import signal

            signal.signal(signal.SIGTERM, old_sigterm)

    def _preempt_agreed(self, cfg) -> bool:
        """Whether to preempt NOW — collectively agreed across hosts.

        SIGTERM delivery is per-process, so on a multi-host slice one host's
        handler can fire a step boundary earlier than another's.  The
        preemption checkpoint is an orbax COLLECTIVE save: entering it on
        host A while host B runs the next step's collectives would deadlock
        (and even without a hang the hosts would stamp different step
        numbers).  A tiny allgather of the local flag at every step boundary
        makes the decision—and therefore the (epoch, step) stamp—identical on
        every host, at the cost of one 4-byte collective per step
        (single-process runs skip it entirely)."""
        if not cfg.TRAIN.CHECKPOINT_ON_PREEMPT:
            return False
        import jax

        if jax.process_count() == 1:
            return getattr(self, "_preempted", False)
        import numpy as np
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray([getattr(self, "_preempted", False)], dtype=np.int32))
        return bool(np.asarray(flags).max())

    def on_epoch_end(self, epoch: int) -> None:
        """LR schedules are step-indexed inside optax; nothing to tick by default."""

    def _device_prefetch(self, loader):
        """Yield (host_batch, device_batch) with the NEXT batch's host->device
        transfer already enqueued while the current step computes.  jax transfers
        are async, so starting the device_put one step early hides H2D latency
        behind the compiled step (the torch-DataLoader pin_memory analog).

        When the device-resident dataset cache is engaged
        (DATASET.DEVICE_CACHE), the host path is bypassed entirely: each batch
        is a single jitted on-device gather by clip index (host_batch is None;
        per-step artifact saving is off whenever the cache is, so nothing
        downstream needs host arrays)."""
        gather = self._device_cache_gather(loader)
        if gather is not None:
            for idx in loader.index_batches():
                yield None, gather(idx)
            return
        it = iter(loader)
        prev = None
        for batch in it:
            db = self._device_batch(batch)
            if prev is not None:
                yield prev
            prev = (batch, db)
        if prev is not None:
            yield prev

    def _device_batch(self, batch):
        """Pipelines override: select array keys and shard over the mesh."""
        raise NotImplementedError

    # Pipelines set this to the batch keys their jitted steps consume; the
    # device cache stages exactly these (voice2pose.py / pose2pose.py).
    _DEVICE_KEYS: tuple = ()

    def _device_cache_eligible(self, loader) -> str:
        """'' when the device-resident train cache can engage for ``loader``,
        else the human-readable reason it cannot."""
        cfg = self.cfg
        if cfg.DATASET.DEVICE_CACHE == "off":
            return "DATASET.DEVICE_CACHE off"
        if loader is not getattr(self, "train_dataloader", None):
            return "not the train loader"
        if not self._DEVICE_KEYS:
            return "pipeline declares no device keys"
        if not cfg.DATASET.CACHING:
            return "needs DATASET.CACHING (SoA arrays)"
        if cfg.TRAIN.SAVE_VIDEO or cfg.TRAIN.SAVE_NPZ:
            return "per-step artifact saving needs host batches"
        if jax.process_count() > 1:
            return "multi-process runs keep per-host loader shards"
        return ""

    def _staged_device_cache(self, loader):
        """The train split's device-key SoA tree staged in HBM (memoized), or
        None when the cache is ineligible or over the size budget.  Shared by
        the per-step gather path (``_device_cache_gather``) and the chunked
        scan path (``_train_epoch_chunked``)."""
        reason = self._device_cache_eligible(loader)
        if reason:
            if self.cfg.DATASET.DEVICE_CACHE == "on":
                raise ValueError(f"DATASET.DEVICE_CACHE on, but: {reason}")
            return None
        cached = getattr(self, "_dev_cache_tree", None)
        if cached is not None:
            return cached

        from ..parallel.mesh import replicated_sharding

        soa = loader.dataset.materialize()
        if soa is None:
            return None
        host = {k: soa[k] for k in self._DEVICE_KEYS if k in soa}
        nbytes = sum(np.asarray(leaf).nbytes for leaf in jax.tree.leaves(host))
        limit = self.cfg.DATASET.DEVICE_CACHE_MAX_MB * 1e6
        if nbytes > limit:
            msg = (f"train set ({nbytes/1e6:.0f} MB) exceeds "
                   f"DATASET.DEVICE_CACHE_MAX_MB ({limit/1e6:.0f} MB)")
            if self.cfg.DATASET.DEVICE_CACHE == "on":
                raise ValueError(f"DATASET.DEVICE_CACHE on, but: {msg}")
            logging.info("device cache disabled: %s", msg)
            return None

        rep = replicated_sharding(self.mesh)
        self._dev_cache_tree = jax.tree.map(
            lambda a: jax.device_put(a, rep), host)
        logging.info("device-resident train cache engaged: %.0f MB in HBM, "
                     "per-step host traffic = one (B,) index array",
                     nbytes / 1e6)
        return self._dev_cache_tree

    def _device_cache_gather(self, loader):
        """Jitted index->device-batch gather over the HBM-resident train set,
        or None when ineligible (see config.py DATASET.DEVICE_CACHE).  The
        cache is staged once per run; every epoch after that moves only a
        (B,)-int32 index array to the device per step."""
        reason = self._device_cache_eligible(loader)
        if reason:
            if self.cfg.DATASET.DEVICE_CACHE == "on":
                raise ValueError(f"DATASET.DEVICE_CACHE on, but: {reason}")
            return None
        cached = getattr(self, "_dev_cache", None)
        if cached is not None:
            return cached
        cache_dev = self._staged_device_cache(loader)
        if cache_dev is None:
            return None

        from ..parallel.mesh import batch_sharding

        sh = batch_sharding(self.mesh)
        jgather = jax.jit(lambda cache, idx: jax.tree.map(
            lambda a: jax.lax.with_sharding_constraint(a[idx], sh), cache))

        def gather(idx):
            return jgather(cache_dev, jnp.asarray(np.asarray(idx),
                                                  dtype=jnp.int32))

        self._dev_cache = gather
        return gather

    # -- dispatch amortization (TRAIN.STEPS_PER_DISPATCH) ------------------------
    def _train_step_body(self):
        """Pipelines return the RAW (unjitted) train step
        ``(state, device_batch, rng) -> (new_state, losses, results)``.
        The per-step path jits it directly; the chunked path scans it over K
        on-device batch gathers (one dispatch per K steps — see config.py
        TRAIN.STEPS_PER_DISPATCH and the floor analysis in docs/PERF.md)."""
        raise NotImplementedError(
            f"{type(self).__name__} exposes no raw train-step body; "
            "TRAIN.STEPS_PER_DISPATCH > 1 is unavailable for it")

    def _get_train_scan(self, length: int):
        """Jitted chunk executable: ``lax.scan`` of the raw train step over a
        (L, B) clip-index schedule, each step's batch gathered from the
        HBM-resident train cache inside the scan body.  One compile per
        distinct chunk length (K, plus the epoch's remainder when
        ``num_batches % K != 0``) — jit would retrace per idx shape anyway;
        keying keeps one Python closure per compiled shape."""
        cache = getattr(self, "_scan_cache", None)
        if cache is None:
            cache = self._scan_cache = {}
        if length not in cache:
            from ..parallel.mesh import batch_sharding

            body_fn = self._train_step_body()
            sh = batch_sharding(self.mesh)

            def chunk(state, cache_dev, idx_chunk, rngs):
                def body(st, per):
                    idx, rng = per
                    batch = jax.tree.map(
                        lambda a: jax.lax.with_sharding_constraint(a[idx], sh),
                        cache_dev)
                    new_st, losses, _ = body_fn(st, batch, rng)
                    return new_st, losses

                return jax.lax.scan(body, state, (idx_chunk, rngs))

            cache[length] = jax.jit(chunk, donate_argnums=(0,))
        return cache[length]

    def _chunk_cache_or_none(self, cfg):
        """The staged device cache when this epoch should run chunked
        (TRAIN.STEPS_PER_DISPATCH > 1 and the cache engages), else None —
        with a one-time logged reason for the per-step fallback."""
        if cfg.TRAIN.STEPS_PER_DISPATCH <= 1:
            return None
        cache_dev = self._staged_device_cache(self.train_dataloader)
        if cache_dev is None and not getattr(self, "_warned_chunk_fb", False):
            self._warned_chunk_fb = True
            logging.warning(
                "TRAIN.STEPS_PER_DISPATCH=%d needs the device-resident train "
                "cache (%s); falling back to one dispatch per step",
                cfg.TRAIN.STEPS_PER_DISPATCH,
                self._device_cache_eligible(self.train_dataloader)
                or "train set over DATASET.DEVICE_CACHE_MAX_MB")
        return cache_dev

    def _train_epoch_chunked(self, cfg, epoch: int, global_step: int,
                             cache_dev) -> int:
        """One training epoch at K = TRAIN.STEPS_PER_DISPATCH steps per device
        dispatch; returns the advanced global_step.  Batch composition and the
        per-step PRNG stream are bit-identical to the per-step path (same
        ``index_batches()`` schedule, same ``_next_rng()`` sequence).
        LOG_INTERVAL lines still appear per step — the scan returns stacked
        (L,) loss rows and the matching rows are logged from the host.
        Preemption checks and profiler windows land on chunk boundaries."""
        K = cfg.TRAIN.STEPS_PER_DISPATCH
        batches = self.train_dataloader.index_batches()
        # the scan carries `step` inside the state; seed it so the carry
        # pytree structure is identical on entry and exit.  Placement must
        # match the scan output's replicated sharding — a bare host scalar has
        # a different aval and forces a full retrace+recompile of the chunk
        # program on the SECOND epoch (pipelines seed it at init; this covers
        # states restored from pre-"step" checkpoints)
        if "step" not in self.state:
            from ..parallel.mesh import replicated_sharding

            self.state["step"] = jax.device_put(
                jnp.asarray(0, jnp.int32), replicated_sharding(self.mesh))
        t_step = 0
        for c0 in range(0, len(batches), K):
            chunk_idx = batches[c0:c0 + K]
            L = len(chunk_idx)
            idx = jnp.asarray(np.stack(chunk_idx), dtype=jnp.int32)
            rngs = jnp.stack([self._next_rng() for _ in range(L)])
            self._maybe_profile(cfg, global_step + 1)
            scan_fn = self._get_train_scan(L)
            self.state, losses = scan_fn(self.state, cache_dev, idx, rngs)
            if self.is_master_process():
                li = cfg.SYS.LOG_INTERVAL
                rows = [j for j in range(L) if (t_step + j + 1) % li == 0]
                if rows:
                    host = jax.device_get(losses)
                    for j in rows:
                        self.logger_writer_step(
                            "TRAIN", {k: v[j] for k, v in host.items()},
                            t_step + j + 1, epoch, global_step + j + 1)
            t_step += L
            global_step += L
            if self._preempt_agreed(cfg):
                self.save_checkpoint(epoch - 1, global_step)
                logging.warning(
                    "Preemption checkpoint saved (epoch %d, step %d); "
                    "exiting 143", epoch - 1, global_step)
                raise SystemExit(143)
        return global_step

    def _maybe_profile(self, cfg, global_step: int) -> None:
        """jax.profiler trace over SYS.PROFILE.NUM_STEPS steps starting at
        SYS.PROFILE.START_STEP (the reference has no profiler; SURVEY §5).
        Boundary checks are range-based, not exact-step: chunked dispatch
        (TRAIN.STEPS_PER_DISPATCH) only visits chunk-start steps, so the
        window opens/closes on the nearest chunk boundary instead."""
        if not cfg.SYS.PROFILE.ENABLED or not self.is_master_process():
            return
        start = cfg.SYS.PROFILE.START_STEP
        end = start + cfg.SYS.PROFILE.NUM_STEPS
        if not getattr(self, "_profiling", False) and start <= global_step < end:
            out = cfg.SYS.PROFILE.OUT_DIR or os.path.join(self.base_path, "profile")
            os.makedirs(out, exist_ok=True)
            logging.info("starting jax.profiler trace -> %s", out)
            jax.profiler.start_trace(out)
            self._profiling = True
        elif getattr(self, "_profiling", False) and global_step >= end:
            jax.profiler.stop_trace()
            self._profiling = False
            logging.info("stopped jax.profiler trace")

    def validate(self, test_dataloader, epoch):
        if self.is_master_process():
            logging.info("Validation begins!")
        epoch_tic = time.time()

        losses_sum: Dict[str, Any] = {}
        epoch_results: Dict[str, Any] = {}
        self.step_tic = time.time()
        for v_step, batch in enumerate(test_dataloader):
            batch_losses, batch_results = self.test_step(batch, v_step + 1, epoch=epoch)
            for k, v in batch_losses.items():
                losses_sum[k] = losses_sum[k] + v if k in losses_sum else v
            epoch_results = self.concat_tensor_dict(batch_results, epoch_results)
        losses_epoch = {k: v / self.num_test_samples for k, v in losses_sum.items()}
        losses_epoch.update(self.evaluate_epoch(epoch_results))

        epoch_toc = (time.time() - epoch_tic) / 60
        if self.is_master_process():
            self.logger_writer_epoch("VAL", epoch_toc, epoch=epoch, losses=losses_epoch)

    def test(self, cfg, exp_tag, checkpoint):
        if self.is_master_process():
            print("Setting up logger and summary writer...")
        self.base_path = self.setup_experiment(False, exp_tag, checkpoint=checkpoint)

        if self.is_master_process():
            self.setup_logger(self.base_path, exp_tag)
            self.tb_writer = _make_tb_writer(self.base_path)
            self.video_writer = VideoWriter(self.cfg)
            logging.info("\n====== Configurations ======\n%s\n============\n", str(cfg))
            logging.info("Testing begins!\n")
        epoch_tic = time.time()

        losses_sum: Dict[str, Any] = {}
        epoch_results: Dict[str, Any] = {}
        self.step_tic = time.time()
        for t_step, batch in enumerate(self.test_dataloader):
            batch_losses, batch_results = self.test_step(batch, t_step + 1, epoch=0)
            for k, v in batch_losses.items():
                losses_sum[k] = losses_sum[k] + v if k in losses_sum else v
            epoch_results = self.concat_tensor_dict(batch_results, epoch_results)
        losses_epoch = {k: v / self.num_test_samples for k, v in losses_sum.items()}
        losses_epoch.update(self.evaluate_epoch(epoch_results))

        epoch_toc = (time.time() - epoch_tic) / 60
        if self.is_master_process():
            self.logger_writer_epoch("TEST", epoch_toc, losses=losses_epoch)
        return losses_epoch

    def demo(self, cfg, exp_tag, checkpoint, demo_input):
        if self.is_master_process():
            print("Setting up logger and summary writer...")
        self.base_path = self.setup_experiment(False, exp_tag, checkpoint=checkpoint,
                                               demo_input=demo_input)

        if self.is_master_process():
            self.setup_logger(self.base_path, exp_tag)
            self.tb_writer = _make_tb_writer(self.base_path)
            self.video_writer = VideoWriter(self.cfg)
            logging.info("\n====== Configurations ======\n%s\n============\n", str(cfg))
            logging.info("Demo begins!\n")
        epoch_tic = time.time()

        self.step_tic = time.time()
        for t_step, batch in enumerate(self.test_dataloader):
            if self.cfg.DEMO.MULTIPLE > 1:
                for i in range(self.cfg.DEMO.MULTIPLE):
                    self.demo_step(batch, t_step + 1, epoch=0, extra_id=i,
                                   interpolation_coeff=i / (self.cfg.DEMO.MULTIPLE - 1))
            else:
                self.demo_step(batch, t_step + 1, epoch=0)

        epoch_toc = (time.time() - epoch_tic) / 60
        if self.is_master_process():
            self.logger_writer_epoch("DEMO", epoch_toc)


def _make_tb_writer(base_path: str):
    """TensorBoard writer: torch's when available (richer video summaries),
    else the in-repo dependency-free event writer (utils/tb_native.py)."""
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(log_dir=base_path)
    except Exception as e:
        from ..utils.tb_native import NativeTBWriter

        logging.info(
            "torch TensorBoard writer unavailable (%s: %s) — using the "
            "native event writer (scalars/figures/images; videos degrade "
            "to filmstrip images).", type(e).__name__, e)
        return NativeTBWriter(log_dir=base_path)

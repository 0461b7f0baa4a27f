"""Unit tests for engine utilities: checkpoint path resolution and optax state
restructuring after raw orbax restores."""

import os

import numpy as np
import pytest

from speechdrivestemplates_tpu.pipelines.trainer import Trainer, restructure_like


def test_resolve_checkpoint_variants(tmp_path):
    exp = tmp_path / "2026_exp-TRAIN-t"
    ck = exp / "checkpoints"
    ck.mkdir(parents=True)
    for e, s in [(1, 10), (2, 20), (10, 100)]:
        (ck / f"checkpoint_epoch-{e}_step-{s}").mkdir()

    expect = str(ck / "checkpoint_epoch-10_step-100")
    assert Trainer.resolve_checkpoint(str(exp)) == expect
    assert Trainer.resolve_checkpoint(str(ck)) == expect
    assert Trainer.resolve_checkpoint(expect) == expect


def test_resolve_checkpoint_orders_numerically(tmp_path):
    ck = tmp_path / "checkpoints"
    ck.mkdir()
    (ck / "checkpoint_epoch-9_step-90").mkdir()
    (ck / "checkpoint_epoch-10_step-100").mkdir()  # lexically before epoch-9
    assert Trainer.resolve_checkpoint(str(ck)).endswith("epoch-10_step-100")


def test_restructure_like_optax_state():
    import jax
    import jax.numpy as jnp
    import optax

    params = {"w": jnp.ones((3,)), "b": jnp.zeros((2,))}
    opt = optax.chain(optax.scale_by_adam(), optax.scale_by_learning_rate(1e-3))
    st = opt.init(params)

    # simulate orbax raw restore: namedtuples -> dicts, tuples -> lists, arrays -> np
    def degrade(x):
        if hasattr(x, "_fields"):
            return {f: degrade(getattr(x, f)) for f in x._fields}
        if isinstance(x, tuple):
            return [degrade(v) for v in x]
        if isinstance(x, dict):
            return {k: degrade(v) for k, v in x.items()}
        return None if x is None else np.asarray(x)

    raw = degrade(st)
    rebuilt = restructure_like(st, raw)
    assert jax.tree.structure(rebuilt) == jax.tree.structure(st)
    chex_leaves = jax.tree.leaves(rebuilt)
    orig_leaves = jax.tree.leaves(st)
    for a, b in zip(chex_leaves, orig_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # an optimizer update must work on the rebuilt state
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(grads, rebuilt, params)
    assert jax.tree.structure(updates) == jax.tree.structure(params)


def test_restructure_like_string_keyed_tuple():
    tpl = (np.zeros(2), {"a": np.ones(3)})
    raw = {"0": np.arange(2), "1": {"a": np.arange(3)}}
    out = restructure_like(tpl, raw)
    assert isinstance(out, tuple)
    np.testing.assert_array_equal(np.asarray(out[0]), [0, 1])


def test_multiply_batch_semantics(rng):
    """Reference mutiply_batch (trainer.py:343-353): tensors repeat-interleave along
    a new leading axis then flatten; lists concatenate."""
    batch = {
        "audio": rng.randn(3, 10).astype(np.float32),
        "speaker": ["a", "b", "c"],
        "nested": {"x": np.arange(3)},
    }
    out = Trainer.multiply_batch(batch, 2)
    assert out["audio"].shape == (6, 10)
    np.testing.assert_array_equal(out["audio"][:3], batch["audio"])
    np.testing.assert_array_equal(out["audio"][3:], batch["audio"])
    assert out["speaker"] == ["a", "b", "c", "a", "b", "c"]
    np.testing.assert_array_equal(out["nested"]["x"], [0, 1, 2, 0, 1, 2])


def test_concat_tensor_dict():
    coll = {}
    Trainer.concat_tensor_dict({"mu": np.ones((2, 4))}, coll)
    Trainer.concat_tensor_dict({"mu": np.zeros((3, 4))}, coll)
    assert coll["mu"].shape == (5, 4)


def test_resolve_checkpoint_raises_when_empty(tmp_path):
    import pytest

    (tmp_path / "checkpoints").mkdir()
    with pytest.raises(FileNotFoundError, match="no checkpoint_"):
        Trainer.resolve_checkpoint(str(tmp_path))


def test_find_auto_resume(tmp_path):
    tag = "voice2pose_sdt_bp-TRAIN-oliver"
    # dir names use setup_experiment's real layout: <datetime>_<tag> with
    # datetime = YYYY-MM-DD_HH-MM-SS-micros
    for dt, pairs in [("2026-01-01_10-00-00-000001", [(1, 10), (2, 20)]),
                      ("2026-01-02_10-00-00-000001", [(3, 30)])]:
        ck = tmp_path / f"{dt}_{tag}" / "checkpoints"
        ck.mkdir(parents=True)
        for e, s in pairs:
            (ck / f"checkpoint_epoch-{e}_step-{s}").mkdir()
    other = tmp_path / f"2026-01-03_10-00-00-000001_{tag}x" / "checkpoints"
    other.mkdir(parents=True)
    (other / "checkpoint_epoch-99_step-990").mkdir()

    found = Trainer.find_auto_resume(str(tmp_path), tag)
    assert found is not None and found.endswith("checkpoint_epoch-3_step-30")
    # no prior runs -> None (fresh start, not an error)
    assert Trainer.find_auto_resume(str(tmp_path), "unknown-tag") is None
    assert Trainer.find_auto_resume(str(tmp_path / "missing"), tag) is None
    # a run dir without checkpoints must not break the scan
    (tmp_path / f"2026-01-04_10-00-00-000001_{tag}").mkdir()
    assert Trainer.find_auto_resume(str(tmp_path), tag).endswith(
        "checkpoint_epoch-3_step-30")
    # micros-less datetime (str(datetime) drops '.0') still matches
    ck = tmp_path / f"2026-01-05_10-00-00_{tag}" / "checkpoints"
    ck.mkdir(parents=True)
    (ck / "checkpoint_epoch-4_step-40").mkdir()
    assert Trainer.find_auto_resume(str(tmp_path), tag).endswith(
        "checkpoint_epoch-4_step-40")


def test_find_auto_resume_requires_exact_tag(tmp_path):
    """A tag that is an underscore-suffix of another tag ('run' vs 'my_run')
    must NOT match the other experiment's directories."""
    dt = "2026-01-01_10-00-00-000001"
    ck = tmp_path / f"{dt}_my_run" / "checkpoints"
    ck.mkdir(parents=True)
    (ck / "checkpoint_epoch-7_step-70").mkdir()

    assert Trainer.find_auto_resume(str(tmp_path), "run") is None
    got = Trainer.find_auto_resume(str(tmp_path), "my_run")
    assert got is not None and got.endswith("checkpoint_epoch-7_step-70")


def test_find_auto_resume_candidates_order(tmp_path):
    tag = "p-TRAIN-t"
    for dt, pairs in [("2026-01-01_10-00-00-000001", [(1, 10), (3, 30)]),
                      ("2026-01-02_10-00-00-000001", [(2, 20)])]:
        ck = tmp_path / f"{dt}_{tag}" / "checkpoints"
        ck.mkdir(parents=True)
        for e, s in pairs:
            (ck / f"checkpoint_epoch-{e}_step-{s}").mkdir()
    # unparseable names must not be offered as candidates
    (tmp_path / f"2026-01-01_10-00-00-000001_{tag}" / "checkpoints"
     / "checkpoint_garbage").mkdir()

    cands = Trainer.find_auto_resume_candidates(str(tmp_path), tag)
    suffixes = [os.path.basename(c) for c in cands]
    assert suffixes == ["checkpoint_epoch-3_step-30",
                       "checkpoint_epoch-2_step-20",
                       "checkpoint_epoch-1_step-10"]


@pytest.mark.slow
def test_auto_resume_skips_corrupt_checkpoint(tmp_path):
    """A preemption mid-save can leave a final-named but unrestorable
    checkpoint dir (non-atomic rename filesystems); AUTO_RESUME must fall
    back to the previous good one instead of crash-looping."""
    import shutil

    from speechdrivestemplates_tpu.config import get_cfg_defaults
    from speechdrivestemplates_tpu.datasets.synthetic import make_synthetic_speaker
    from speechdrivestemplates_tpu.pipelines import get_pipeline

    root = tmp_path / "speakers"
    out = tmp_path / "out"
    make_synthetic_speaker(str(root), "oliver", num_train=4, num_dev=0)
    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(
        os.path.dirname(__file__), "..", "configs", "voice2pose_sdt_bp.yaml"))
    cfg.DATASET.ROOT_DIR = str(root)
    cfg.DATASET.SPEAKER = "oliver"
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.SYS.NUM_WORKERS = 0
    cfg.SYS.OUTPUT_DIR = str(out)
    cfg.TRAIN.AUTO_RESUME = True
    cfg.freeze()

    tag = "sdt_bp-TRAIN-t"
    # a prior run that saved epoch-1 (good) and epoch-2 (to be corrupted)
    pipe = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    pipe.setup_dataset(cfg, "train")
    pipe.setup_model(cfg)
    pipe.setup_optimizer()
    pipe.base_path = str(out / f"2026-01-01_00-00-00_{tag}")
    pipe.save_checkpoint(epoch=1, global_step=10)
    pipe.save_checkpoint(epoch=2, global_step=20)
    ck2 = os.path.join(pipe.base_path, "checkpoints",
                       "checkpoint_epoch-2_step-20")
    # truncate: keep the final-named dir but destroy its contents
    shutil.rmtree(ck2)
    os.makedirs(ck2)

    fresh = get_pipeline(cfg.PIPELINE_TYPE)(cfg)
    base_path, epoch, step = fresh.setup_experiment(True, tag)
    assert (epoch, step) == (1, 10)
    assert base_path == pipe.base_path  # resumed into the original exp dir


@pytest.mark.parametrize("num_epochs", [3, 5, 8, 10, 11, 12, 30, 100])
def test_multistep_lr_matches_torch(num_epochs):
    """_multistep_lr == torch.optim.lr_scheduler.MultiStepLR at milestones
    [N-10, N-2], gamma 0.1 (reference voice2pose.py:253-257) — including the
    small-N regimes where a milestone is negative (never fires) or zero
    (fires at scheduler construction)."""
    import torch

    from speechdrivestemplates_tpu.pipelines.voice2pose import _multistep_lr

    spe = 4  # steps per epoch
    sched = _multistep_lr(1.0, num_epochs, spe, enabled=True)

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=1.0)
    tsched = torch.optim.lr_scheduler.MultiStepLR(
        opt, [num_epochs - 10, num_epochs - 2], gamma=0.1)

    for epoch in range(num_epochs):
        want = opt.param_groups[0]["lr"]
        for s in range(epoch * spe, (epoch + 1) * spe):
            got = float(sched(s)) if callable(sched) else float(sched)
            np.testing.assert_allclose(got, want, rtol=1e-6, err_msg=(
                f"N={num_epochs} epoch={epoch} step={s}"))
        opt.step()
        tsched.step()


def test_multistep_lr_disabled_and_zero_steps():
    from speechdrivestemplates_tpu.pipelines.voice2pose import _multistep_lr

    assert _multistep_lr(0.5, 100, 4, enabled=False) == 0.5
    assert _multistep_lr(0.5, 100, 0, enabled=True) == 0.5

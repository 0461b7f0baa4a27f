"""voice2pose main program — CLI-compatible with the reference's ``main.py:14-69``.

Same six flags (--config_file, --resume_from, --test_only, --demo_input, --checkpoint,
--tag) plus trailing yacs-style KEY VALUE overrides; mode precedence demo > test >
train.  TPU-era distribution: instead of mp.spawn + NCCL process groups
(reference main.py:53-67), one process drives every local device through a jitted
step over a data mesh; multi-host slices initialize jax.distributed (SYS.DISTRIBUTED)
and shard data per process.
"""

from __future__ import annotations

import argparse
import warnings

warnings.simplefilter("ignore")

from speechdrivestemplates_tpu.config import get_cfg_defaults
from speechdrivestemplates_tpu.pipelines import get_pipeline


def setup_config():
    parser = argparse.ArgumentParser(description="voice2pose main program")
    parser.add_argument("--config_file", default="", metavar="FILE",
                        help="path to config file")
    parser.add_argument("--resume_from", type=str, default=None,
                        help="the checkpoint to resume from")
    parser.add_argument("--pretrain_from", type=str, default=None,
                        help="checkpoint to initialize the model from (fresh "
                             "experiment dir; reference README documents this flag "
                             "— equivalent to TRAIN.PRETRAIN_FROM)")
    parser.add_argument("--test_only", action="store_true",
                        help="perform testing and evaluation only")
    parser.add_argument("--demo_input", type=str, default=None,
                        help="path to input for demo")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="the checkpoint to test with")
    parser.add_argument("--tag", type=str, default="",
                        help="tag for the experiment")
    parser.add_argument("--export", type=str, default=None, metavar="PATH",
                        help="AOT-export the wav->pose serving function "
                             "(weights + speaker stats baked in) to PATH as a "
                             "serialized StableHLO artifact; requires "
                             "--checkpoint (see utils/export.py)")
    parser.add_argument("--export_torch", type=str, default=None, metavar="PATH",
                        help="convert --checkpoint to a reference-format "
                             "PyTorch .pth (model weights; see "
                             "utils/torch_export.py)")
    parser.add_argument("--export_batch", type=int, default=1,
                        help="batch size baked into the --export artifact "
                             "(XLA serving contract: one artifact per batch "
                             "shape; export several for several serving "
                             "points — e.g. 1 for latency, 128 for "
                             "throughput)")
    parser.add_argument("--export_platforms", type=str, default="cpu,tpu",
                        help="comma-separated lowering platforms baked into "
                             "the --export artifact (an artifact can only be "
                             "called on a platform it was lowered for); "
                             "'native' locks it to this host's backend")
    parser.add_argument(
        "opts",
        help="Modify config options using the command-line",
        default=None,
        nargs=argparse.REMAINDER,
    )
    args = parser.parse_args()

    cfg = get_cfg_defaults()
    cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    if args.pretrain_from is not None:
        cfg.TRAIN.PRETRAIN_FROM = args.pretrain_from
    cfg.freeze()
    return args, cfg


def run(args, cfg):
    if cfg.SYS.DEBUG_NANS:
        import jax

        jax.config.update("jax_debug_nans", True)

    pipeline = get_pipeline(cfg.PIPELINE_TYPE)(cfg)

    cfg_name = args.config_file.split("/")[-1].split(".")[0]
    if args.export_torch:
        from speechdrivestemplates_tpu.utils.torch_export import export_checkpoint

        assert args.checkpoint, "--export_torch requires --checkpoint"
        meta = export_checkpoint(cfg, args.checkpoint, args.export_torch)
        print(f"exported {meta['num_keys']} tensors (epoch {meta['epoch']}, "
              f"step {meta['step']}) to {args.export_torch}")
    elif args.export:
        from speechdrivestemplates_tpu.utils.export import export_serving_fn

        assert args.checkpoint, "--export requires --checkpoint"
        platforms = (None if args.export_platforms == "native"
                     else tuple(args.export_platforms.split(",")))
        meta = export_serving_fn(cfg, args.checkpoint, args.export,
                                 batch_size=args.export_batch,
                                 platforms=platforms, pipeline=pipeline)
        print(f"exported {meta['bytes']} bytes to {args.export} "
              f"(platforms {meta['platforms']}, {meta['inputs']} -> "
              f"{meta['output']})")
    elif args.demo_input:
        exp_tag = cfg_name + "-DEMO-" + args.tag
        pipeline.demo(cfg, exp_tag, args.checkpoint, args.demo_input)
    elif args.test_only:
        exp_tag = cfg_name + "-TEST-" + args.tag
        pipeline.test(cfg, exp_tag, args.checkpoint)
    else:
        exp_tag = cfg_name + "-TRAIN-" + args.tag
        pipeline.train(cfg, exp_tag, args.resume_from)


def main():
    args, cfg = setup_config()

    if cfg.SYS.PLATFORM:
        # must precede jax.distributed.initialize and any device enumeration
        # (see config.py SYS.PLATFORM)
        import jax

        jax.config.update("jax_platforms", cfg.SYS.PLATFORM)

    if cfg.SYS.COMPILE_CACHE_DIR:
        # Persistent XLA compile cache: a warm production run skips the
        # minutes of remote compile that dominated the round-4 stage walls
        # (docs/PERF.md "Production workflow").
        from speechdrivestemplates_tpu.utils.jax_cache import enable_compile_cache

        enable_compile_cache(cfg.SYS.COMPILE_CACHE_DIR)

    if cfg.SYS.DISTRIBUTED:
        # Multi-host TPU slice: every host runs this same program; jax.distributed
        # wires the DCN mesh (replaces MASTER_ADDR/PORT + NCCL rendezvous).
        import jax

        jax.distributed.initialize()

    run(args, cfg)


if __name__ == "__main__":
    main()

"""yacs-compatible configuration system.

The reference uses yacs (`/root/reference/configs/default.py:1-101`,
`/root/reference/main.py:14-34`): a nested CfgNode tree with defaults, merged from a
YAML file and then from a flat ``KEY.SUBKEY VALUE`` CLI list, then frozen.  yacs is not
available in this environment, so this module provides a small, behavior-compatible
implementation plus the exact default schema of the reference.

Public surface (mirrors yacs):
  - ``CfgNode``: dict subclass with attribute access, ``merge_from_file``,
    ``merge_from_list``, ``merge_from_other_cfg``, ``freeze``, ``defrost``,
    ``clone``, ``dump``, and yacs-style ``__str__``.
  - ``get_cfg_defaults()``: default config tree identical (keys and values) to the
    reference's ``configs/default.py``.
"""

from __future__ import annotations

import ast
import copy
from typing import Any, Dict, List

import yaml

_VALID_TYPES = (tuple, list, str, int, float, bool, type(None))


class CfgNode(dict):
    """A yacs-style configuration node: nested dict with attribute access and freeze."""

    IMMUTABLE = "__immutable__"

    def __init__(self, init_dict: Dict[str, Any] | None = None):
        init_dict = {} if init_dict is None else init_dict
        init_dict = self._create_tree(init_dict)
        super().__init__(init_dict)
        self.__dict__[CfgNode.IMMUTABLE] = False

    @classmethod
    def _create_tree(cls, d: Dict[str, Any]) -> Dict[str, Any]:
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out[k] = cls(v)
            else:
                _assert_valid_value(v, k)
                out[k] = v
        return out

    # -- attribute access -----------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        if name in self:
            return self[name]
        raise AttributeError(f"Non-existent config key: {name}")

    def __setattr__(self, name: str, value: Any) -> None:
        if self.is_frozen():
            raise AttributeError(
                f"Attempted to set {name} to {value}, but CfgNode is immutable"
            )
        _assert_valid_value(value, name)
        self[name] = value

    def __setitem__(self, name: str, value: Any) -> None:
        if self.is_frozen():
            raise AttributeError(
                f"Attempted to set {name} to {value}, but CfgNode is immutable"
            )
        super().__setitem__(name, value)

    # -- freeze / clone -------------------------------------------------------
    def freeze(self) -> None:
        self._set_immutable(True)

    def defrost(self) -> None:
        self._set_immutable(False)

    def is_frozen(self) -> bool:
        return self.__dict__[CfgNode.IMMUTABLE]

    def _set_immutable(self, value: bool) -> None:
        self.__dict__[CfgNode.IMMUTABLE] = value
        for v in self.values():
            if isinstance(v, CfgNode):
                v._set_immutable(value)

    def clone(self) -> "CfgNode":
        return copy.deepcopy(self)

    def __deepcopy__(self, memo) -> "CfgNode":
        cls = self.__class__
        result = cls.__new__(cls)
        memo[id(self)] = result
        dict.__init__(result)
        result.__dict__[CfgNode.IMMUTABLE] = False
        for k, v in self.items():
            dict.__setitem__(result, copy.deepcopy(k, memo), copy.deepcopy(v, memo))
        result.__dict__[CfgNode.IMMUTABLE] = self.__dict__[CfgNode.IMMUTABLE]
        return result

    # -- merging --------------------------------------------------------------
    def merge_from_file(self, cfg_filename: str) -> None:
        with open(cfg_filename, "r") as f:
            loaded = yaml.safe_load(f)
        if loaded is None:
            return
        # yacs applies _decode_cfg_value to every loaded leaf, which rescues YAML 1.1
        # quirks like `1e-4` parsing as a string.
        self.merge_from_other_cfg(CfgNode(_decode_tree(loaded)))

    def merge_from_other_cfg(self, other: "CfgNode") -> None:
        _merge_a_into_b(other, self, self, [])

    def merge_from_list(self, cfg_list: List[str]) -> None:
        assert len(cfg_list) % 2 == 0, (
            f"Override list has odd length: {cfg_list}; it must be a list of pairs"
        )
        for full_key, v in zip(cfg_list[0::2], cfg_list[1::2]):
            key_parts = full_key.split(".")
            d = self
            for sub_key in key_parts[:-1]:
                assert sub_key in d, f"Non-existent key: {full_key}"
                d = d[sub_key]
            sub_key = key_parts[-1]
            assert sub_key in d, f"Non-existent key: {full_key}"
            value = _decode_cfg_value(v)
            value = _check_and_coerce_cfg_value_type(value, d[sub_key], sub_key, full_key)
            d[sub_key] = value

    # -- serialization ----------------------------------------------------
    def _to_plain_dict(self) -> Dict[str, Any]:
        out = {}
        for k, v in self.items():
            out[k] = v._to_plain_dict() if isinstance(v, CfgNode) else v
        return out

    def dump(self, **kwargs) -> str:
        return yaml.safe_dump(self._to_plain_dict(), **kwargs)

    def __str__(self) -> str:
        def _indent(s, num_spaces):
            lines = s.split("\n")
            first = lines.pop(0)
            lines = [(num_spaces * " ") + line for line in lines]
            return "\n".join([first] + lines)

        r = ""
        s = []
        for k, v in sorted(self.items()):
            separator = "\n" if isinstance(v, CfgNode) else " "
            attr_str = f"{str(k)}:{separator}{str(v)}"
            attr_str = _indent(attr_str, 2)
            s.append(attr_str)
        r += "\n".join(s)
        return r

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}({super().__repr__()})"


def _assert_valid_value(value: Any, name: str) -> None:
    if isinstance(value, CfgNode):
        return
    if isinstance(value, dict):
        return
    if not isinstance(value, _VALID_TYPES):
        raise ValueError(
            f"Invalid config value type {type(value)} for key {name}; "
            f"valid types: {_VALID_TYPES}"
        )


def _merge_a_into_b(a: "CfgNode", b: "CfgNode", root: "CfgNode", key_list: List[str]):
    for k, v_ in a.items():
        full_key = ".".join(key_list + [str(k)])
        if k not in b:
            raise KeyError(f"Non-existent config key: {full_key}")
        v = copy.deepcopy(v_)
        if isinstance(v, CfgNode):
            if not isinstance(b[k], CfgNode):
                raise ValueError(f"Config key {full_key} is not a nested node in base")
            _merge_a_into_b(v, b[k], root, key_list + [str(k)])
        else:
            v = _check_and_coerce_cfg_value_type(v, b[k], k, full_key)
            b[k] = v


def _decode_tree(d: Dict[str, Any]) -> Dict[str, Any]:
    return {
        k: _decode_tree(v) if isinstance(v, dict) else _decode_cfg_value(v)
        for k, v in d.items()
    }


def _decode_cfg_value(value: Any) -> Any:
    """Decode a raw (string) override value into a Python object, like yacs does."""
    if isinstance(value, dict):
        return CfgNode(value)
    if not isinstance(value, str):
        return value
    try:
        return ast.literal_eval(value)
    except (ValueError, SyntaxError):
        return value


def _check_and_coerce_cfg_value_type(replacement, original, key, full_key):
    original_type = type(original)
    replacement_type = type(replacement)

    if replacement_type == original_type or original is None or replacement is None:
        return replacement

    # yacs-compatible casts
    casts = [(tuple, list), (list, tuple), (int, float)]
    for from_type, to_type in casts:
        if replacement_type == from_type and original_type == to_type:
            return to_type(replacement)

    raise ValueError(
        f"Type mismatch ({original_type} vs. {replacement_type}) with values "
        f"({original} vs. {replacement}) for config key: {full_key}"
    )


# ---------------------------------------------------------------------------
# Default schema — key-for-key identical to the reference's configs/default.py
# (/root/reference/configs/default.py:4-97), with TPU-era additions under SYS
# and TRAIN that have no reference counterpart (mesh/precision knobs).
# ---------------------------------------------------------------------------

def _build_defaults() -> CfgNode:
    _C = CfgNode()
    _C.PIPELINE_TYPE = None

    _C.VOICE2POSE = CfgNode()
    _C.VOICE2POSE.STRICT_LOADING = True
    _C.VOICE2POSE.GENERATOR = CfgNode()
    _C.VOICE2POSE.GENERATOR.NAME = None
    _C.VOICE2POSE.GENERATOR.LEAKY_RELU = True
    _C.VOICE2POSE.GENERATOR.NORM = "IN"
    _C.VOICE2POSE.GENERATOR.LAMBDA_REG = 1.0
    _C.VOICE2POSE.GENERATOR.LAMBDA_CLIP_KL = 0.1
    _C.VOICE2POSE.GENERATOR.CLIP_CODE = CfgNode()
    _C.VOICE2POSE.GENERATOR.CLIP_CODE.DIMENSION = None
    _C.VOICE2POSE.GENERATOR.CLIP_CODE.LR_SCALING = 1.0
    _C.VOICE2POSE.GENERATOR.CLIP_CODE.TRAIN = True
    _C.VOICE2POSE.GENERATOR.CLIP_CODE.FRAME_VARIANT = False
    _C.VOICE2POSE.GENERATOR.CLIP_CODE.SAMPLE_FROM_NORMAL = False
    _C.VOICE2POSE.GENERATOR.CLIP_CODE.TEST_WITH_GT_CODE = False
    _C.VOICE2POSE.GENERATOR.CLIP_CODE.EXTERNAL_CODE = False
    _C.VOICE2POSE.GENERATOR.CLIP_CODE.EXTERNAL_CODE_PTH = None

    _C.VOICE2POSE.POSE_ENCODER = CfgNode()
    _C.VOICE2POSE.POSE_ENCODER.NAME = "PoseSeqEncoder"
    _C.VOICE2POSE.POSE_ENCODER.AE_CHECKPOINT = None

    _C.VOICE2POSE.POSE_DISCRIMINATOR = CfgNode()
    _C.VOICE2POSE.POSE_DISCRIMINATOR.NAME = None
    _C.VOICE2POSE.POSE_DISCRIMINATOR.LEAKY_RELU = False
    _C.VOICE2POSE.POSE_DISCRIMINATOR.LAMBDA_GAN = 1.0
    _C.VOICE2POSE.POSE_DISCRIMINATOR.MOTION = True
    _C.VOICE2POSE.POSE_DISCRIMINATOR.WHITE_LIST = None

    _C.POSE2POSE = CfgNode()
    _C.POSE2POSE.AUTOENCODER = CfgNode()
    _C.POSE2POSE.AUTOENCODER.NAME = None
    _C.POSE2POSE.AUTOENCODER.LEAKY_RELU = True
    _C.POSE2POSE.AUTOENCODER.NORM = "BN"
    _C.POSE2POSE.AUTOENCODER.CODE_DIM = 32
    _C.POSE2POSE.LAMBDA_REG = 1.0
    _C.POSE2POSE.LAMBDA_KL = 0.1

    _C.DATASET = CfgNode()
    _C.DATASET.NAME = "GestureDataset"
    _C.DATASET.ROOT_DIR = "datasets/speakers"
    _C.DATASET.SUBSET = None
    _C.DATASET.NUM_LANDMARKS = 121
    _C.DATASET.HIERARCHICAL_POSE = True
    _C.DATASET.SPEAKER = None
    _C.DATASET.NUM_FRAMES = 64
    _C.DATASET.AUDIO_LENGTH = 68267
    _C.DATASET.MAX_DEMO_LENGTH = 24  # seconds
    _C.DATASET.AUDIO_SR = 16000  # audio sampling rate
    _C.DATASET.FPS = 15
    _C.DATASET.CACHING = False
    # --- TPU-native addition: device-resident train set -------------------
    # This model family's whole training set is small next to HBM (the
    # reference 1,024-clip fixture is ~345 MB vs 16 GB on v5e), while the
    # per-step host work (SoA gather + device_put through a possibly remote
    # link) dominates the production epoch wall.  'auto'/'on' stages the
    # train split's device keys in HBM ONCE and turns each step's batch into
    # an on-device jitted gather by clip index — zero per-step host marshal.
    # Engages only when: CACHING is True (the SoA arrays exist), the split is
    # train, per-step artifact saving is off, the estimated bytes fit
    # DEVICE_CACHE_MAX_MB, and the run is single-process (multi-host keeps
    # the per-process loader shards).  Batch composition is bit-identical to
    # the host path: the same DataLoader index schedule feeds both.
    _C.DATASET.DEVICE_CACHE = "auto"  # 'auto' | 'on' (assert eligible) | 'off'
    _C.DATASET.DEVICE_CACHE_MAX_MB = 2048

    _C.TRAIN = CfgNode()
    _C.TRAIN.NUM_EPOCHS = 100
    _C.TRAIN.BATCH_SIZE = 32
    _C.TRAIN.SAVE_VIDEO = True
    _C.TRAIN.SAVE_NPZ = False
    _C.TRAIN.LR = 1e-4
    _C.TRAIN.WD = 0
    _C.TRAIN.LR_SCHEDULER = True
    _C.TRAIN.PRETRAIN_FROM = None
    # restartable (preemptible) jobs: resume from this tag's newest checkpoint
    # automatically when no --resume_from is given (see Trainer.find_auto_resume)
    _C.TRAIN.AUTO_RESUME = False
    # on SIGTERM (preemption notice), finish the in-flight step, save a
    # checkpoint, and exit 143 — pairs with AUTO_RESUME for restartable jobs
    _C.TRAIN.CHECKPOINT_ON_PREEMPT = True
    _C.TRAIN.VALIDATE = True
    _C.TRAIN.NUM_RESULT_SAMPLE = 2
    _C.TRAIN.CHECKPOINT_INTERVAL = 1  # epochs between checkpoint saves
    # --- TPU-native addition: dispatch amortization ------------------------
    # Run K train steps inside ONE device dispatch (lax.scan over on-device
    # index gathers).  The pose2pose floor analysis (docs/PERF.md) measured
    # the 22-GFLOP step at 88% host-dispatch overhead through a remote
    # tunnel: 2.09 ms/step measured vs 0.251 ms device-only under scan.
    # K > 1 bounds the per-step dispatch cost at 1/K of the per-call cost.
    # Requires the device-resident train cache (DATASET.DEVICE_CACHE) to be
    # engaged — the scan body gathers each step's batch from HBM by clip
    # index, so batch composition stays bit-identical to the per-step path
    # (same DataLoader index schedule, same per-step PRNG stream).  When the
    # cache cannot engage, training falls back to one dispatch per step with
    # a logged reason.  Log lines, preemption checks, and profiler windows
    # land on chunk boundaries (LOG_INTERVAL is normally >> K).
    _C.TRAIN.STEPS_PER_DISPATCH = 1

    _C.TEST = CfgNode()
    _C.TEST.BATCH_SIZE = 32
    _C.TEST.NUM_RESULT_SAMPLE = 8
    _C.TEST.SAVE_VIDEO = True
    _C.TEST.SAVE_NPZ = True
    _C.TEST.MULTIPLE = 1

    _C.DEMO = CfgNode()
    _C.DEMO.MULTIPLE = 1
    _C.DEMO.NUM_SAMPLES = 1
    _C.DEMO.CODE_INDEX = None
    _C.DEMO.CODE_INDEX_B = None
    _C.DEMO.CODE_PATH = None
    # --- TPU-native long-form demo (no reference counterpart; the reference caps
    # demo audio at MAX_DEMO_LENGTH and compiles one dynamic forward) ---
    _C.DEMO.WINDOWED = False      # slice long audio into fixed windows
    _C.DEMO.WINDOW_FRAMES = 64    # frames per window (matches the train shape)
    _C.DEMO.HALO_FRAMES = 16      # overlap cropped/cross-faded per side
    # EXACT long-form generation: shard the generator's time axis across the
    # device mesh (halo-exchanged convs + psum'd InstanceNorm — see
    # parallel/seqparallel.py). Output equals the dense forward on the
    # silence-padded audio, trimmed; unlike WINDOWED there is no crossfade
    # approximation. Takes precedence over WINDOWED when both are set.
    _C.DEMO.SEQUENCE_PARALLEL = False
    # Dense-path length bucketing: pad demo audio up to a multiple of this many
    # SECONDS of frames before compiling, and trim the trailing pad frames from
    # the outputs.  A directory of N distinct clip lengths then compiles
    # ceil(max_len / bucket) executables instead of N (XLA specializes on
    # static shapes; the reference's torch forward is shape-polymorphic,
    # reference generator.py:41, gesture_dataset.py:61-69).  0 disables.
    _C.DEMO.LENGTH_BUCKET_S = 2.0

    _C.SYS = CfgNode()
    _C.SYS.OUTPUT_DIR = "output/"
    _C.SYS.CANVAS_SIZE = (720, 1280)
    _C.SYS.VISUALIZATION_SCALING = 0.85
    _C.SYS.VIDEO_FORMAT = ["mp4", "img"]  # any of ['tensorboard', 'mp4', 'img']
    _C.SYS.ASYNC_VIDEO_SAVING = False
    _C.SYS.LOG_INTERVAL = 100  # steps between log lines
    _C.SYS.NUM_WORKERS = 8
    _C.SYS.DISTRIBUTED = False
    _C.SYS.WORLD_SIZE = 1
    # Reference rendezvous knobs kept for CLI compatibility; unused on TPU where
    # jax.distributed.initialize() discovers peers (reference: main.py:53-58).
    _C.SYS.MASTER_ADDR = "localhost"
    _C.SYS.MASTER_PORT = 21379

    # --- TPU-native additions (no reference counterpart) ---
    _C.SYS.MESH = CfgNode()
    _C.SYS.MESH.DATA = -1  # -1: use all local devices on the 'data' axis
    _C.SYS.SEED = 0
    _C.TRAIN.PRECISION = "fp32"  # 'fp32' | 'bf16' (compute dtype for conv stacks)
    _C.SYS.MEL_IMPL = "auto"  # 'auto' | 'dft' | 'dft2' | 'rfft' | 'conv' | 'pallas'
    # Fused Pallas audio-encoder stem on the inference path (probes/stem_pallas.py).
    # Hardware-validated but measured SLOWER than XLA's conv lowering at the
    # batch-128 serving point (see the module docstring) — default off.
    _C.SYS.FUSED_STEM = False
    # Patches-matmul formulation for the generator's 2D stem convs (>1 input
    # channel): forward-identical params, but autodiff yields matmul gradients
    # instead of XLA's conv-backward kernels — the measured batch-128 train
    # gap sits in conv-grad HBM bandwidth (docs/PERF.md train speed-of-light).
    # Enable only if bench_profile.py --conv-bwd-probe wins on the chip.
    _C.SYS.CONV_MM_GRAD = False
    _C.SYS.PROFILE = CfgNode()
    _C.SYS.PROFILE.ENABLED = False
    _C.SYS.PROFILE.START_STEP = 10   # global step to start the jax.profiler trace
    _C.SYS.PROFILE.NUM_STEPS = 5     # trace duration in steps
    _C.SYS.PROFILE.OUT_DIR = None    # default: <exp>/profile
    _C.SYS.DEBUG_NANS = False        # jax_debug_nans: fail fast on non-finite values
    # Pin the jax backend ('' = jax default selection).  'cpu' matters
    # operationally: this image force-registers a remote TPU plugin whose
    # device enumeration BLOCKS when the tunnel is down, and the JAX_PLATFORMS
    # env var alone does not override it — only the in-process config does.
    # `SYS.PLATFORM cpu` keeps the whole CLI usable through an outage.
    _C.SYS.PLATFORM = ""
    # Persistent XLA compilation cache directory (utils/jax_cache.py), shared
    # by every CLI invocation: on remote-compile backends the first compile of
    # a train/eval/demo step costs minutes that the cache eliminates on every
    # later run.  '' disables.  The default is also overridable via the
    # JAX_COMPILATION_CACHE_DIR env var.
    _C.SYS.COMPILE_CACHE_DIR = "~/.cache/sdt_jax"

    return _C


_DEFAULTS = _build_defaults()
_DEFAULTS.freeze()


def get_cfg_defaults() -> CfgNode:
    """Return a fresh mutable clone of the default config (reference: configs/default.py:99-101)."""
    cfg = _DEFAULTS.clone()
    cfg.defrost()
    return cfg

"""retr_tpu — a TPU-native (JAX/XLA/Pallas/pjit) referring-expression-generation framework.

Re-implements the full capability surface of the RE:TR reference
(simeonjunker/retr: DETR-style ResNet + transformer encoder-decoder captioner for
RefCOCO/RefCOCO+/RefCOCOg) as an idiomatic JAX framework:

- ``retr_tpu.config``      — typed Config with the reference's knob names
  (reference: configuration_template.py).
- ``retr_tpu.masking``     — (array, mask) pytree substrate, inverted-mask convention
  (True = pad), causal masks (reference: models/utils.py).
- ``retr_tpu.models``      — ResNet backbone with folded FrozenBatchNorm, ConcatTransformer
  encoder-decoder, Caption/CaptionLoc/CaptionGlobalLoc variants
  (reference: models/).
- ``retr_tpu.ops``         — fused attention (XLA + Pallas), PIL-exact image resize as
  MXU matmuls, preprocessing ops (reference: implicit in torch/PIL C code).
- ``retr_tpu.decode``      — jit-compiled KV-cached greedy + beam search with static shapes
  (reference: eval_utils/decode.py, greedy only).
- ``retr_tpu.data``        — RefCOCO annotation pipeline, native WordPiece tokenizer,
  fused XLA input pipeline (reference: data_utils/).
- ``retr_tpu.engine``      — train/eval loops (reference: engine.py).
- ``retr_tpu.train``       — optax train state, Orbax checkpointing, torch .pth import
  (reference: main.py, train_utils/checkpoints.py).
- ``retr_tpu.metrics``     — native CIDEr/BLEU/METEOR/ROUGE_L (reference: nlgeval submodule).
- ``retr_tpu.parallel``    — device mesh + sharding rules (dp + optional tensor-parallel
  vocab/FFN sharding) for multi-chip eval sweeps and training.
"""

__version__ = "0.1.0"

from retr_tpu.config import Config  # noqa: F401


def __getattr__(name):
    """Lazy top-level API (keeps `import retr_tpu` light)."""
    if name in ("Predictor", "ServingQueue"):
        from retr_tpu import predictor as _p

        return getattr(_p, name)
    if name == "build_model":
        from retr_tpu.models.caption import build_model

        return build_model
    if name in ("greedy", "beam_search", "sample", "greedy_with_prefix",
                "sequence_scores", "greedy_decoding", "greedy_with_attention"):
        from retr_tpu import decode as _d

        return getattr(_d, name)
    if name == "NLGEval":
        from retr_tpu.metrics import NLGEval

        return NLGEval
    if name == "Masked":
        from retr_tpu.masking import Masked

        return Masked
    raise AttributeError(f"module 'retr_tpu' has no attribute {name!r}")

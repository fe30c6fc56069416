from retr_tpu.metrics.nlg import NLGEval, compute_metrics  # noqa: F401

from mmpde_tpu.eval.evaluate import evaluate, evaluate_tri, itp_error

__all__ = ["evaluate", "evaluate_tri", "itp_error"]

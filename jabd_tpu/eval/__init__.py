from jabd_tpu.eval.wider_eval import evaluate_wider, image_eval  # noqa: F401

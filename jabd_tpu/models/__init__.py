from jabd_tpu.models.retinaface import RetinaFace, build_model  # noqa: F401

from jabd_tpu.ops import anchors, boxes  # noqa: F401

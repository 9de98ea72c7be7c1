from jabd_tpu.data.wider import (  # noqa: F401
    WiderFaceDataset,
    batch_targets,
    parse_wider_labels,
)

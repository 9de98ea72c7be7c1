"""Face-recognition half of the framework (AdaFace-style).

Reference: the vendored mk-minchul/AdaFace stack (SURVEY.md section 2.6)
— IR/IR-SE embedding backbones (net.py), the margin head (whose head.py
is MISSING in the reference, breaking train_val.py:9 — re-implemented
here from the AdaFace paper), 10-fold verification eval
(evaluate_utils.py), feature fusion (utils.py:20), and the
low-quality-face identification protocols (validation_lq/).
"""

from jabd_tpu.recognition.net import IRBackbone, build_model  # noqa: F401
from jabd_tpu.recognition.heads import build_head  # noqa: F401

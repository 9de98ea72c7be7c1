"""Training observability.

Reference: utils/callbacks.py:7-49 — LossHistory appends to a txt file and
re-plots a savgol-smoothed PNG each epoch; tqdm postfix shows the running
Conf/Regression/LandMark losses (train_mobilenetV3_ecagai.py:539-542).
"""

from __future__ import annotations

import os
import time
from typing import List


class LossHistory:
    def __init__(self, log_dir: str, plot: bool = True):
        ts = time.strftime("%Y_%m_%d_%H_%M_%S")
        self.save_path = os.path.join(log_dir, f"loss_{ts}")
        os.makedirs(self.save_path, exist_ok=True)
        self.losses: List[float] = []
        self.plot = plot

    def append_loss(self, loss: float) -> None:
        self.losses.append(float(loss))
        with open(
            os.path.join(self.save_path, "epoch_loss.txt"), "a"
        ) as f:
            f.write(f"{float(loss)}\n")
        if self.plot:
            self._plot()

    def _plot(self) -> None:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            it = range(len(self.losses))
            plt.figure()
            plt.plot(it, self.losses, "red", linewidth=2, label="train loss")
            if len(self.losses) >= 7:
                from scipy.signal import savgol_filter

                num = 5 if len(self.losses) < 25 else 15
                plt.plot(
                    it,
                    savgol_filter(self.losses, num, 3),
                    "green",
                    linestyle="--",
                    linewidth=2,
                    label="smooth train loss",
                )
            plt.grid(True)
            plt.xlabel("Epoch")
            plt.ylabel("Loss")
            plt.legend(loc="upper right")
            plt.savefig(
                os.path.join(self.save_path, "epoch_loss.png")
            )
            plt.close("all")
        except Exception:
            pass  # plotting must never break training

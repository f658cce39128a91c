"""Streaming metrics.

Reference: ``ClassificationEvaluator`` (``metrics.h:8-20``,
``metrics.cpp:6-20``) — accumulate correct/sample counts, ``get()`` the
running top-1 accuracy, ``clear()``. Same surface here, plus a mean-loss
accumulator (the reference keeps that ad hoc in ``cnn.cpp:72-73``).
"""

from __future__ import annotations


class ClassificationEvaluator:
    def __init__(self):
        self.correct_num = 0
        self.sample_num = 0

    def compute(self, predict, labels) -> None:
        """Accumulate a batch; accepts arrays or lists of int."""
        import numpy as np
        predict = np.asarray(predict)
        labels = np.asarray(labels)
        self.correct_num += int((predict == labels).sum())
        self.sample_num += int(labels.shape[0])

    def add_counts(self, correct: int, total: int) -> None:
        """Accumulate device-computed counts (avoids host argmax)."""
        self.correct_num += int(correct)
        self.sample_num += int(total)

    def get(self) -> float:
        return self.correct_num / self.sample_num if self.sample_num else 0.0

    def clear(self) -> None:
        self.correct_num = 0
        self.sample_num = 0


class MeanLoss:
    def __init__(self):
        self.total = 0.0
        self.count = 0

    def add(self, loss: float) -> None:
        self.total += float(loss)
        self.count += 1

    def get(self) -> float:
        return self.total / self.count if self.count else 0.0

    def clear(self) -> None:
        self.total = 0.0
        self.count = 0

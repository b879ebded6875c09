"""Text formatting matching the reference's golden-file conventions."""
from __future__ import annotations

import numpy as np


def print_formatted(matrix: np.ndarray, threshold: float = 0.01) -> str:
    """Reference tests/tp_02.cc:12-30: %7.2f per entry, blank if |x|<0.01,
    one trailing newline after the matrix."""
    m = np.atleast_2d(np.asarray(matrix))
    lines = []
    for i in range(m.shape[0]):
        row = "".join("       " if abs(m[i, j]) < threshold
                      else "%7.2f" % m[i, j]
                      for j in range(m.shape[1]))
        lines.append(row)
    return "\n".join(lines) + "\n\n"

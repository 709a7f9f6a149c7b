"""Out-of-process progress monitoring: read the ``"{step} {n_steps}"`` file
written by a running job.

Behavioral parity target: ``blackjax/progress_reader.py:22-71``.
"""
import sys
import time
from typing import Optional

__all__ = ["read_progress", "main"]


def read_progress(path: str) -> Optional[tuple[int, int]]:
    """Return ``(step, num_steps)`` from a progress file, or None if the
    file is absent/partial."""
    try:
        with open(path) as f:
            parts = f.read().split()
        if len(parts) != 2:
            return None
        return int(parts[0]), int(parts[1])
    except (OSError, ValueError):
        return None


def main(argv=None) -> int:
    """CLI: ``python -m blackjax_tpu.progress_reader <file> [--watch N]``."""
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print("usage: progress_reader <progress-file> [--watch seconds]", file=sys.stderr)
        return 2
    path = argv[0]
    watch = None
    if "--watch" in argv:
        idx = argv.index("--watch")
        watch = float(argv[idx + 1]) if len(argv) > idx + 1 else 5.0

    while True:
        progress = read_progress(path)
        if progress is None:
            print(f"{path}: no progress yet")
        else:
            step, total = progress
            pct = 100.0 * step / max(total, 1)
            print(f"{step}/{total} ({pct:.1f}%)")
            if watch is not None and step >= total:
                return 0
        if watch is None:
            return 0 if progress is not None else 1
        time.sleep(watch)


if __name__ == "__main__":
    raise SystemExit(main())

"""Small runtime utilities."""
from __future__ import annotations

import os
from pathlib import Path


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache — first compile of the production
    tower takes minutes through the TPU tunnel; cached reloads are seconds."""
    import jax

    cache_dir = path or os.environ.get("JAX_CACHE_DIR",
                                       str(Path.home() / ".cache" / "jax_cache"))
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 - older jax naming
        pass


def write_table(df, path) -> None:
    """Excel when openpyxl/xlsxwriter is available, CSV fallback — air-gapped
    parity with the reference's xlsx artifacts (scripts/zero_shot.py:161-165,
    scripts/CTCLIPTrainer.py:266-327)."""
    from pathlib import Path

    path = Path(path)
    try:
        df.to_excel(path, index=False)
    except Exception:  # noqa: BLE001 - missing engine
        df.to_csv(path.with_suffix(".csv"), index=False)


def tree_size_bytes(tree) -> int:
    import jax
    import numpy as np

    return sum(np.asarray(x).nbytes for x in jax.tree.leaves(tree))

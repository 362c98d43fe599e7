"""Observability: JSONL metric rows + PNG sample grids.

SURVEY.md §5.5: per-eval rows ``{step, elbo_nats, acc, nmi,
img_per_sec_per_chip}`` appended to ``<run_dir>/metrics.jsonl`` and echoed to
stdout; qualitative sample/reconstruction grids saved per eval for parity
with the reference's matplotlib outputs.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np


class RunLogger:
    def __init__(self, run_dir: str, echo: bool = True, write: bool = True):
        """``write=False`` disables the JSONL file (multi-host: process 0 is
        the sole writer so concurrent appends never interleave rows)."""
        self.run_dir = run_dir
        self.echo = echo
        self.write = write
        if write:
            os.makedirs(run_dir, exist_ok=True)
        self.path = os.path.join(run_dir, 'metrics.jsonl')

    def log(self, row: Dict[str, Any]) -> None:
        row = {k: (float(v) if isinstance(v, (np.floating, np.integer)) else v)
               for k, v in row.items()}
        row.setdefault('time', time.time())
        if self.write:
            with open(self.path, 'a') as f:
                f.write(json.dumps(row) + '\n')
        if self.echo:
            show = {k: (round(v, 4) if isinstance(v, float) else v)
                    for k, v in row.items() if k != 'time'}
            print(f'[gmvae] {show}', flush=True)


def save_latent_plot(path: str, z: np.ndarray, labels: Optional[np.ndarray]
                     = None) -> bool:
    """2-D latent scatter (PCA if D>2), colored by label/cluster.

    Parity with the reference's per-epoch latent plots. Uses matplotlib when
    present (lazy import); returns False (no file) when it is not — the
    framework never hard-requires it.
    """
    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
    except ImportError:
        return False
    z = np.asarray(z, np.float64)
    if z.shape[1] == 1:
        # 1-D latent: plot value vs a zero axis (z[:, 1] would IndexError)
        z = np.concatenate([z, np.zeros_like(z)], axis=1)
    projected = z.shape[1] > 2
    if projected:
        zc = z - z.mean(0)
        _, _, vt = np.linalg.svd(zc, full_matrices=False)
        z = zc @ vt[:2].T
    fig, ax = plt.subplots(figsize=(6, 6), dpi=110)
    c = None if labels is None else np.asarray(labels)
    sc = ax.scatter(z[:, 0], z[:, 1], c=c, s=4, cmap='tab10', alpha=0.7)
    if c is not None:
        fig.colorbar(sc, ax=ax, shrink=0.8)
    ax.set_title('latent space (PCA)' if projected else 'latent space')
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, bbox_inches='tight')
    plt.close(fig)
    return True


def save_image_grid(path: str, images: np.ndarray,
                    ncol: Optional[int] = None) -> None:
    """Tile ``[N, H, W, C]`` float images in [0,1] into one PNG grid.

    Written with a minimal PNG encoder (no matplotlib/PIL dependency in the
    hot path — pure stdlib zlib + struct).
    """
    import struct
    import zlib

    images = np.asarray(images)
    n, h, w, c = images.shape
    ncol = ncol or int(np.ceil(np.sqrt(n)))
    nrow = -(-n // ncol)
    pad = nrow * ncol - n
    if pad:
        images = np.concatenate([images, np.zeros((pad, h, w, c))], 0)
    grid = (images.reshape(nrow, ncol, h, w, c)
            .transpose(0, 2, 1, 3, 4)
            .reshape(nrow * h, ncol * w, c))
    grid = np.clip(grid * 255.0, 0, 255).astype(np.uint8)
    if grid.shape[-1] == 1:
        grid = np.repeat(grid, 3, axis=-1)

    gh, gw, _ = grid.shape
    raw = b''.join(b'\x00' + grid[row].tobytes() for row in range(gh))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack('>I', len(data)) + tag + data +
                struct.pack('>I', zlib.crc32(tag + data)))

    png = (b'\x89PNG\r\n\x1a\n' +
           chunk(b'IHDR', struct.pack('>IIBBBBB', gw, gh, 8, 2, 0, 0, 0)) +
           chunk(b'IDAT', zlib.compress(raw, 6)) +
           chunk(b'IEND', b''))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, 'wb') as f:
        f.write(png)

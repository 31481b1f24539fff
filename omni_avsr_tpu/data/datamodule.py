"""DataModule: train/val/test batch iterators with background prefetch.

Equivalent of `datamodule/data_module.py:147-243` without torch DataLoader:
a thread pool decodes clips (OpenCV releases the GIL) while the TPU computes,
and batches are re-bucketed every epoch (the reference sets
`reload_dataloaders_every_n_epochs=1`, `train_OmniAVSR.py:51`).

Per-modality frame budgets follow the reference (`data_module.py:168-173`):
audio counts audio frames (len/640), video/audiovisual count video frames.
Validation uses max_frames=1000, num_buckets=1 (`data_module.py:214-216`).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional

from ..config import DataConfig
from .batching import CollateConfig, bucket_batches, collate
from .dataset import AVDataset
from .tokenizer import TokenizerBundle


class DataModule:
    def __init__(
        self,
        cfg: DataConfig,
        tok: TokenizerBundle,
        modality: str = "audiovisual",
        downsample_video: Optional[int] = None,
    ):
        self.cfg = cfg
        self.tok = tok
        self.modality = modality
        self.downsample_video = downsample_video

    def _max_frames(self) -> int:
        return {
            "audio": self.cfg.max_frames_audio,
            "video": self.cfg.max_frames_video,
            "audiovisual": self.cfg.max_frames_audiovisual,
        }[self.modality]

    def _dataset(self, label_file: str) -> AVDataset:
        return AVDataset(
            self.cfg.root_dir, label_file, self.modality,
            downsample_video=self.downsample_video,
        )

    def _lengths(self, ds: AVDataset) -> List[int]:
        # manifests store 25 fps frame counts for every modality (the same
        # CSV drives ASR/VSR/AVSR in the reference); heuristically convert
        # sample-count manifests (values way above any plausible frame count)
        if self.modality == "audio" and ds.input_lengths and max(ds.input_lengths) > 16000:
            return [max(1, l // 640) for l in ds.input_lengths]
        return ds.input_lengths

    def train_batches(self, epoch: int) -> Iterator[Dict]:
        ds = self._dataset(self.cfg.train_file)
        batches = bucket_batches(
            self._lengths(ds), self._max_frames(), self.cfg.train_num_buckets,
            shuffle=True, seed=epoch,
        )
        ccfg = CollateConfig(modality=self.modality, is_trainval=True)
        return _prefetch_iter(ds, batches, self.tok, ccfg, self.cfg.num_workers)

    def val_batches(self) -> Iterator[Dict]:
        ds = self._dataset(self.cfg.val_file)
        batches = bucket_batches(self._lengths(ds), 1000, 1, shuffle=False)
        ccfg = CollateConfig(modality=self.modality, is_trainval=True)
        return _prefetch_iter(ds, batches, self.tok, ccfg, self.cfg.num_workers)

    def test_batches(self, batch_size: int = 1) -> Iterator[Dict]:
        """batch_size 1 reproduces the reference exactly; larger batches are
        grouped by length and decoded with the gap-tolerant masked prefix,
        which keeps per-sample semantics identical (PARITY.md deviation 1)."""
        ds = self._dataset(self.cfg.test_file)
        if batch_size <= 1:
            batches = [[i] for i in range(len(ds))]
        else:
            order = sorted(range(len(ds)), key=lambda i: ds.input_lengths[i])
            batches = [order[i:i + batch_size] for i in range(0, len(order), batch_size)]
        ccfg = CollateConfig(modality=self.modality, is_trainval=False)
        return _prefetch_iter(ds, batches, self.tok, ccfg, self.cfg.num_workers)

    def steps_per_epoch(self) -> int:
        ds = self._dataset(self.cfg.train_file)
        return len(bucket_batches(
            self._lengths(ds), self._max_frames(), self.cfg.train_num_buckets, shuffle=True
        ))


def _prefetch_iter(
    ds: AVDataset,
    batches: List[List[int]],
    tok: TokenizerBundle,
    ccfg: CollateConfig,
    num_workers: int,
    depth: int = 4,
) -> Iterator[Dict]:
    """Decode + collate batches on a thread pool, keep `depth` in flight."""
    pool = ThreadPoolExecutor(max_workers=max(1, num_workers))

    def make(batch_idx: List[int]) -> Dict:
        samples = list(pool.map(ds.__getitem__, batch_idx))
        return collate(samples, tok, ccfg)

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = object()

    def producer():
        try:
            for b in batches:
                q.put(make(b))
            q.put(stop)
        except BaseException as e:  # surface loader errors, don't truncate
            q.put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        pool.shutdown(wait=False)

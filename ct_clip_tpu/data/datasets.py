"""CT-RATE dataset handling: reports CSV + metadata CSV + NIfTI folders.

Host side only reads and decodes; all voxel math (HU rescale, resample,
crop/pad, normalize) runs on device via ops.resample.  Mirrors:
  * CTReportDataset (scripts/data.py:36-174): train split, returns
    (volume, findings_text)
  * CTReportDatasetinfer (scripts/data_inference_nii.py:38-176): returns
    (volume, text, onehot_labels, accession_name)

Reference text quirk preserved: although both Findings_EN and Impressions_EN
are read, the text used is Findings_EN only (data.py:73-83 overwrites the
concatenation with impression_text[0]), with quotes/parens stripped
(data.py:165-173).
"""
from __future__ import annotations

import csv
import glob
import os
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import PATHOLOGIES
from .nifti import read_volume


def _clean_text(text: str) -> str:
    for ch in ('"', "'", "(", ")"):
        text = text.replace(ch, "")
    return text


def _read_csv(path: str | Path) -> List[Dict[str, str]]:
    with open(path, newline="", encoding="utf-8") as f:
        return list(csv.DictReader(f))


def parse_xy_spacing(raw: str) -> float:
    """Reference parse: row['XYSpacing'][1:][:-2].split(',')[0]
    (data.py:102) — e.g. "[0.75, 0.75]" -> 0.75."""
    return float(raw[1:][:-2].split(",")[0])


@dataclass
class VolumeMeta:
    path: str
    text: str
    slope: float
    intercept: float
    spacing_zxy: Tuple[float, float, float]
    labels: Optional[np.ndarray] = None  # (18,) one-hot for infer datasets

    @property
    def accession(self) -> str:
        return os.path.basename(self.path).replace(".nii.gz", "").replace(".nii", "")


class CTReportDataset:
    """Training dataset: walks data_folder/patient/accession/*.nii.gz,
    joins reports + metadata CSVs, keeps the first `percent`% of samples
    (reference keeps 80%, data.py:43-46)."""

    clip_before_resample = False  # train ordering (data.py:122)

    def __init__(self, data_folder: str, reports_file: str, meta_file: str,
                 percent: int = 80, labels_file: Optional[str] = None):
        self.data_folder = data_folder
        reports = {r["VolumeName"]: (r.get("Findings_EN", ""),
                                     r.get("Impressions_EN", ""))
                   for r in _read_csv(reports_file)}
        meta = {r["VolumeName"]: r for r in _read_csv(meta_file)}
        labels = None
        if labels_file is not None:
            labels = {r["VolumeName"]: np.asarray(
                [float(r.get(p, 0) or 0) for p in PATHOLOGIES], np.float32)
                for r in _read_csv(labels_file)}

        self.samples: List[VolumeMeta] = []
        pattern = os.path.join(data_folder, "*", "*", "*.nii.gz")
        for nii_file in sorted(glob.glob(pattern)):
            name = os.path.basename(nii_file)
            if name not in reports or name not in meta:
                continue
            findings, _impressions = reports[name]
            row = meta[name]
            try:
                xy = parse_xy_spacing(row["XYSpacing"])
                z = float(row["ZSpacing"])
                slope = float(row["RescaleSlope"])
                intercept = float(row["RescaleIntercept"])
            except (KeyError, ValueError):
                continue
            self.samples.append(VolumeMeta(
                path=nii_file, text=_clean_text(str(findings)), slope=slope,
                intercept=intercept, spacing_zxy=(z, xy, xy),
                labels=None if labels is None else labels.get(name)))
        if percent < 100:
            self.samples = self.samples[: int(len(self.samples) * percent / 100)]

    def __len__(self) -> int:
        return len(self.samples)

    def read_raw(self, index: int, dtype=None, layout: str = "zxy",
                 inflate_threads: int = 1) -> Tuple[np.ndarray, VolumeMeta]:
        """Returns ((Z, X, Y) raw voxels, meta).  NIfTI fdata is (X, Y, Z);
        transpose matches data.py:115.

        `dtype=np.int16` keeps the stored voxel ints (half the host->HBM
        bytes of f32; the CSV slope/intercept are applied on device by the
        fused preprocess).  Only valid when the header carries no scaling of
        its own — true for CT-RATE, where rescale lives in metadata.csv —
        otherwise the scaled-f32 path is used regardless.

        `layout="zyx"` (with dtype) skips the host-side in-plane transpose
        and returns the file's bytes as a zero-copy (Z, Y, X) view; the
        consumer transposes axes (1, 2) on device (one cheap HBM pass vs a
        ~0.3 s strided host copy per volume)."""
        meta = self.samples[index]
        if dtype is not None:
            vol, hdr = read_volume(meta.path, apply_scaling=False,
                                   dtype=dtype,
                                   layout="zyx" if layout == "zyx" else "xyz",
                                   threads=inflate_threads)
            if (hdr.scl_slope in (0.0, 1.0) and hdr.scl_inter == 0.0):
                if layout == "zyx":
                    return vol, meta
                return np.ascontiguousarray(vol.transpose(2, 0, 1)), meta
        vol, _hdr = read_volume(meta.path, threads=inflate_threads)
        vol = vol.transpose(2, 0, 1)
        if layout == "zyx":
            vol = vol.transpose(0, 2, 1)
        return np.ascontiguousarray(vol), meta


class CTReportDatasetInfer(CTReportDataset):
    """Validation/inference dataset: no subsampling, one-hot labels, HU clip
    before resample (data_inference_nii.py:115-117)."""

    clip_before_resample = True

    def __init__(self, data_folder: str, reports_file: str, meta_file: str,
                 labels: str):
        super().__init__(data_folder, reports_file, meta_file, percent=100,
                         labels_file=labels)
        self.samples = [s for s in self.samples if s.labels is not None]

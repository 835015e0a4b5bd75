from .nifti import NiftiHeader, load_header, read_volume, write_volume
from .tokenizer import WordPieceTokenizer, load_tokenizer
from .datasets import (CTReportDataset, CTReportDatasetInfer, VolumeMeta,
                       parse_xy_spacing)
from .loader import RawSample, VolumeLoader, bucket_shape

__all__ = ["NiftiHeader", "load_header", "read_volume", "write_volume",
           "WordPieceTokenizer", "load_tokenizer", "CTReportDataset",
           "CTReportDatasetInfer", "VolumeMeta", "parse_xy_spacing",
           "RawSample", "VolumeLoader", "bucket_shape"]

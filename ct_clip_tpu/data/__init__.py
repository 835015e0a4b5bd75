from .nifti import NiftiHeader, load_header, read_volume, write_volume
from .tokenizer import WordPieceTokenizer, load_tokenizer
from .bpe import SimpleBpeTokenizer
from .datasets import (CTReportDataset, CTReportDatasetInfer, VolumeMeta,
                       parse_xy_spacing)
from .loader import RawSample, VolumeLoader, bucket_shape
from .media import (cast_num_frames, collate_with_strings, gif_to_video,
                    mp4_to_video, video_to_gif, video_to_mp4)
from .generatect import (VideoDataset, VideoTextDataset,
                         VideoTextDatasetSuperres, resize_video)

__all__ = ["NiftiHeader", "load_header", "read_volume", "write_volume",
           "WordPieceTokenizer", "load_tokenizer", "SimpleBpeTokenizer",
           "CTReportDataset",
           "CTReportDatasetInfer", "VolumeMeta", "parse_xy_spacing",
           "RawSample", "VolumeLoader", "bucket_shape", "cast_num_frames",
           "collate_with_strings", "gif_to_video", "mp4_to_video",
           "video_to_gif", "video_to_mp4", "VideoDataset", "VideoTextDataset",
           "VideoTextDatasetSuperres", "resize_video"]

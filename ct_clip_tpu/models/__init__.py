from .bert import BertModel, RadBertClassifier
from .ctvit import CTViT, from_torch_layout
from .ctclip import CTCLIP, contrastive_loss
from .mlm import MLM, subset_mask_with_prob
from .visual_ssl import SimCLR, SimSiam, nt_xent_loss, simsiam_loss
from .maskgit import (MaskGit, SelfCritic, TokenCritic, cosine_schedule_mask,
                      critic_train_loss, gumbel_sample, maskgit_train_loss,
                      sample_tokens)
from .t5_encoder import (T5Encoder, T5EncoderConfig, convert_hf_t5_encoder,
                         t5_base_v1_1)

__all__ = ["BertModel", "RadBertClassifier", "CTViT", "from_torch_layout",
           "CTCLIP", "contrastive_loss", "MLM", "subset_mask_with_prob",
           "SimCLR", "SimSiam", "nt_xent_loss", "simsiam_loss", "MaskGit",
           "TokenCritic", "SelfCritic", "cosine_schedule_mask", "critic_train_loss",
           "gumbel_sample", "maskgit_train_loss", "sample_tokens",
           "T5Encoder", "T5EncoderConfig", "convert_hf_t5_encoder",
           "t5_base_v1_1"]

from .bert import BertModel, RadBertClassifier
from .ctvit import CTViT, from_torch_layout
from .ctclip import CTCLIP, contrastive_loss

__all__ = ["BertModel", "RadBertClassifier", "CTViT", "from_torch_layout",
           "CTCLIP", "contrastive_loss"]

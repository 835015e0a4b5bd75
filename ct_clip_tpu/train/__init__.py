from .optimizer import (cawr_schedule, cosine_annealing_warmup_restarts,
                        cosine_lr_schedule, decay_mask, get_optimizer,
                        label_smoothing_loss, topk_accuracy)
from .train_step import TrainState, create_train_state, make_train_step
from .checkpoint import CheckpointManager, load_variables, save_variables
from .trainer import CTClipTrainer, MetricLogger
from .finetune import (LIPRO_POS_WEIGHTS, LiProHead, bce_with_logits,
                       lipro_predict, make_lipro_latent_fn, make_lipro_step,
                       make_vocabfine_step, train_vocabfine,
                       vocabfine_loss, vocabfine_prompt_batch)
from .ctvit_trainer import (CTViTTrainer, Discriminator3D, ema_update,
                            reconstruct_dataset)
from .maskgit_trainer import MaskGitTrainer
from .text_classifier import (ReportClassificationDataset,
                              TextClassifierTrainer, multilabel_report,
                              sentence_shuffle)

__all__ = ["label_smoothing_loss", "topk_accuracy", "cawr_schedule", "cosine_annealing_warmup_restarts",
           "cosine_lr_schedule", "decay_mask", "get_optimizer", "TrainState",
           "create_train_state", "make_train_step", "CheckpointManager",
           "load_variables", "save_variables", "CTClipTrainer", "MetricLogger",
           "LIPRO_POS_WEIGHTS", "LiProHead", "bce_with_logits",
           "lipro_predict", "make_lipro_latent_fn", "make_lipro_step",
           "make_vocabfine_step", "train_vocabfine", "vocabfine_loss", "vocabfine_prompt_batch",
           "CTViTTrainer", "Discriminator3D", "ema_update", "reconstruct_dataset", "MaskGitTrainer",
           "ReportClassificationDataset", "TextClassifierTrainer",
           "multilabel_report", "sentence_shuffle"]

from .zero_shot import ZeroShotClassifier, pathology_prompts, run_zero_shot
from .latents import export_latents

__all__ = ["ZeroShotClassifier", "pathology_prompts", "run_zero_shot",
           "export_latents"]

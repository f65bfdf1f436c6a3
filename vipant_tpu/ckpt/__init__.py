"""Checkpointing: Orbax native IO + torch/CLIP/reference porters."""

from .clip_port import (
    port_audio_from_audio,
    port_clip_text,
    port_clip_visual,
    split_clip_state_dict,
)
from .orbax_io import (
    extract_model_files,
    latest_checkpoint,
    load_checkpoint,
    load_checkpoint_config,
    save_checkpoint,
)
from .reference_export import (
    export_loss_sd,
    export_reference_pth,
    export_text_sd,
    export_visual_sd,
)
from .reference_port import (
    load_torch_file,
    port_reference_audio,
    port_reference_image,
    port_reference_text,
    reference_loss_params,
    split_reference_checkpoint,
)

__all__ = [
    "export_loss_sd",
    "export_reference_pth",
    "export_text_sd",
    "export_visual_sd",
    "extract_model_files",
    "latest_checkpoint",
    "load_checkpoint",
    "load_checkpoint_config",
    "load_torch_file",
    "port_audio_from_audio",
    "port_clip_text",
    "port_clip_visual",
    "port_reference_audio",
    "port_reference_image",
    "port_reference_text",
    "reference_loss_params",
    "save_checkpoint",
    "split_clip_state_dict",
    "split_reference_checkpoint",
]

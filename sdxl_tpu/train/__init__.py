"""Training subsystem (capability extension — the reference is strictly
inference-only, SURVEY.md §2 / README.md; there is no training, autodiff
or optimizer anywhere in /root/reference).

TPU-native fine-tuning for the model families this framework serves:

  - LoRA fine-tuning (train/lora.py): low-rank factor pairs injected as
    ``lora_down``/``lora_up`` leaves next to the frozen base weights and
    applied UNMERGED at the linear() use site (ops/linear.py), so
    gradients flow only through the factors. Composes with the int8/int4
    quantized base layout (QLoRA: a 12B FLUX.1 fine-tunes on one chip).
  - Diffusion losses (train/losses.py): epsilon / v-prediction with
    min-SNR-gamma weighting and noise offset for the UNet families, and
    the logit-normal-timestep rectified-flow loss for SD3/Flux.
  - A pure-functional train step (train/step.py): optax transform +
    gradient accumulation (lax.scan over microbatches) + EMA, jitted
    once; multi-chip via the same (data, model) GSPMD mesh as inference
    (batch dp-sharded, frozen tower tp-sharded, LoRA factors replicated).
  - Checkpoint/resume (train/checkpoint.py, orbax) and safetensors LoRA
    export in the ecosystem formats io/lora.py reads back (kohya /
    diffusers-peft) — a trained adapter round-trips into `--lora`.
  - Full-parameter fine-tuning (train/full.py): every float leaf trains
    against a stripped template; Adafactor (factored state) fits the
    full SDXL UNet on one chip, and ZeRO-1 shardings split master
    weights + optimizer state over the data axis for multi-chip runs.
    Trained UNets export to the diffusers layout
    (io/diffusers_write.py) and drop back into any base checkpoint.
"""

from .checkpoint import (  # noqa: F401
    latest_step,
    restore_train_state,
    save_train_state,
)
from .lora import (  # noqa: F401
    export_lora,
    init_lora,
    lora_state_dict,
    set_leaves,
)
from .full import (  # noqa: F401
    adafactor_sched,
    full_trainable,
    merge_trained,
    shard_state_zero1,
    zero_shardings,
)
from .losses import diffusion_loss, flow_matching_loss  # noqa: F401
from .step import TrainState, adamw_cosine, make_train_step  # noqa: F401

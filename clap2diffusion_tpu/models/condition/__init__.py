from clap2diffusion_tpu.models.condition.adapter import (
    AudioAdapter,
    AudioTokenGenerator,
    GatedAudioCrossAttention,
)
from clap2diffusion_tpu.models.condition.hierarchical import (
    AudioProjectionTransformer77,
    AdaptiveHierarchyWeights,
    CrossHierarchyAttention,
    HierarchicalAudioEncoder,
    HierarchicalAudioV4,
    LevelToUNetRouter,
    RigidHierarchicalDecomposition,
    SoftHierarchicalDecomposition,
    assignment_stats,
    compute_condition_losses,
)
from clap2diffusion_tpu.models.condition.inject import AudioInjection
from clap2diffusion_tpu.models.condition.temperature import (
    temperature_at_step,
    temperature_from_config,
)

__all__ = [
    "AudioAdapter",
    "AudioTokenGenerator",
    "GatedAudioCrossAttention",
    "AudioProjectionTransformer77",
    "AdaptiveHierarchyWeights",
    "CrossHierarchyAttention",
    "HierarchicalAudioEncoder",
    "HierarchicalAudioV4",
    "LevelToUNetRouter",
    "RigidHierarchicalDecomposition",
    "SoftHierarchicalDecomposition",
    "AudioInjection",
    "assignment_stats",
    "compute_condition_losses",
    "temperature_at_step",
    "temperature_from_config",
]

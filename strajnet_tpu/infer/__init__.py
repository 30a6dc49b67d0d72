from strajnet_tpu.infer.submission import (
    ChallengeSubmission,
    ScenarioPrediction,
    quantize_waypoints,
)

__all__ = ["ChallengeSubmission", "ScenarioPrediction", "quantize_waypoints"]

from .diversity import (  # noqa: F401
    assign_to_clusters,
    calculate_diversity_score,
    diversity_entropy,
    embedding_dist_to_mean,
    ward_cluster,
)
from .fid import (  # noqa: F401
    calculate_fid_from_features,
    compute_feature_stats,
    frechet_distance,
    load_stats,
    save_stats,
)
from .inception_score import inception_score_from_logits  # noqa: F401
from .inception_v3 import (  # noqa: F401
    InceptionV3,
    convert_torch_state_dict,
    load_inception,
    make_feature_fn,
)
from .precision_recall import (  # noqa: F401
    Manifold,
    build_manifold,
    compute_precision_recall,
    load_manifold,
    save_manifold,
)

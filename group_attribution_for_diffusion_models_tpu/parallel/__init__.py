from .ensemble import (  # noqa: F401
    EnsembleTrainer,
    init_ensemble_state,
    pad_member_indices,
    stack_states,
    unstack_state,
)
from .mesh import (  # noqa: F401
    ensemble_sharding,
    make_mesh,
    replicate,
    shard_ensemble,
)

from .riccati import batched_riccati, riccati_supported
from .rollout import batched_ls_rollout, rollout_supported

from .parallel_riccati import parallel_backward_pass
from .riccati import batched_riccati, riccati_supported
from .rollout import batched_ls_rollout, rollout_supported

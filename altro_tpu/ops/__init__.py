from .riccati import batched_riccati, riccati_supported

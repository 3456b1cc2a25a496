from .batches import BatchPlan, plan_batches  # noqa: F401
from .replay import replay  # noqa: F401

from .batches import BatchPlan, plan_batches, plan_batches_multi  # noqa: F401
from .replay import SchemaDriftError, replay, replay_multi  # noqa: F401

from .assembly import committed_data_events  # noqa: F401
from .compaction import last_writer_wins  # noqa: F401
from .typing import typed_changes  # noqa: F401

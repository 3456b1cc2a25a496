from .parse import parse_events  # noqa: F401
from .wal_log import read_wal_log  # noqa: F401

from .stream_replay import stream_replay  # noqa: F401

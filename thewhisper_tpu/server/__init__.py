from thewhisper_tpu.server.http import StreamingServer, SessionManager  # noqa: F401

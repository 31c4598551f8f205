from fugu_tpu.server.app import create_app, start_http_server

__all__ = ["create_app", "start_http_server"]

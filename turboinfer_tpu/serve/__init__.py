"""Serving layer: ServingEngine (threaded scheduler driver) + an
OpenAI-compatible HTTP server. Beyond-reference subsystem (the
reference is a blocking library with no server)."""

from turboinfer_tpu.serve.engine import ServingEngine, StreamEnd
from turboinfer_tpu.serve.http_server import make_server, serve_forever

__all__ = ["ServingEngine", "StreamEnd", "make_server", "serve_forever"]

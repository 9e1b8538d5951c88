from .engine import Engine, Request
from .server import EngineServer

__all__ = ["Engine", "Request", "EngineServer"]

from .builder import Ctx, TaskGraph, TaskGraphBuilder, TaskGraphID
from .executor import Executor

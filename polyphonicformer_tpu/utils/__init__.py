from .profiling import StepTimer, trace_context

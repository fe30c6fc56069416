# Observability: structured logging, profiling, debug guards.

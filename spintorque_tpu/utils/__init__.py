"""Foundation utilities: monitoring, safety, validation, errors, profiling,
logging, checkpointing.

TPU counterpart of spin_torque_gym/utils (__init__.py:7-23). The reference's
three overlapping cache stacks (utils/performance.py, utils/cache.py,
utils/performance_optimization.py) have no analog: jit compilation caching
replaces memoization, and result caches were a source of reference bugs
(current-blind solver cache, stale observation cache - see SURVEY.md). The
thread/process-pool tier (concurrency.py, scaling.py, scalable_environment.py)
is replaced by the first-class mesh sharding in spintorque_tpu.parallel.
"""

from .checkpoint import (
    CheckpointManager,
    load_params,
    load_pytree,
    save_params,
    save_pytree,
)
from .error_handling import (
    ConfigurationError,
    DeviceError,
    ErrorRecoveryManager,
    NumericalError,
    PhysicsError,
    SpinTorqueError,
    robust_computation,
    safe_division,
    safe_execute,
    safe_log,
    safe_normalize,
    safe_sqrt,
)
from .logging_config import (
    LoggingContext,
    PerformanceLogger,
    StructuredFormatter,
    get_logger,
    setup_logging,
)
from .monitoring import (
    EnvironmentMonitor,
    HealthMonitor,
    MetricsCollector,
    SafetyWrapper,
    default_health_monitor,
)
from .profiling import PerformanceProfiler, block_and_time, device_trace
from .security import (
    InputSanitizer,
    RateLimiter,
    SecureHasher,
    SecurityAuditor,
    SecurityError,
)
from .validation import (
    ActionValidator,
    NumericalValidator,
    PhysicsValidator,
    ValidationError,
    validate_action,
    validate_environment_config,
    validate_magnetization,
    validate_observation,
    validate_parameters,
)

__all__ = [
    "CheckpointManager",
    "load_params",
    "load_pytree",
    "save_params",
    "save_pytree",
    "ConfigurationError",
    "DeviceError",
    "ErrorRecoveryManager",
    "NumericalError",
    "PhysicsError",
    "SpinTorqueError",
    "robust_computation",
    "safe_division",
    "safe_execute",
    "safe_log",
    "safe_normalize",
    "safe_sqrt",
    "LoggingContext",
    "PerformanceLogger",
    "StructuredFormatter",
    "get_logger",
    "setup_logging",
    "EnvironmentMonitor",
    "HealthMonitor",
    "MetricsCollector",
    "SafetyWrapper",
    "default_health_monitor",
    "PerformanceProfiler",
    "block_and_time",
    "device_trace",
    "InputSanitizer",
    "RateLimiter",
    "SecureHasher",
    "SecurityAuditor",
    "SecurityError",
    "ActionValidator",
    "NumericalValidator",
    "PhysicsValidator",
    "ValidationError",
    "validate_action",
    "validate_environment_config",
    "validate_magnetization",
    "validate_observation",
    "validate_parameters",
]

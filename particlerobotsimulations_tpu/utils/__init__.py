"""Profiling and misc utilities."""
from .profiling import Throughput, measure_throughput, scaling_report

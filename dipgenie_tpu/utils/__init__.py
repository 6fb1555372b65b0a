from .timing import realtime, cputime, peakrss_bytes, log_stage

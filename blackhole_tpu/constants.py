"""Physical and numerical constants for the black hole engine.

Geometric units G = c = 1 throughout (matching the reference engine's
convention, see /root/reference/include/math_util.h:20-31).
"""

import math

PI = math.pi
TWO_PI = 2.0 * math.pi
HALF_PI = 0.5 * math.pi

# Numerical guard used throughout (reference: BH_EPSILON, math_util.h:24).
EPSILON = 1e-9

# Guard factor: rays are considered captured once r <= HORIZON_CAPTURE_FACTOR * r_h
# (reference uses 1.05 * r_s, raytracer.c:652).
HORIZON_CAPTURE_FACTOR = 1.01

# Blackbody color-mapping temperature range in Kelvin
# (reference: math_util.c:463-469).
MIN_TEMP_K = 1000.0
MAX_TEMP_K = 40000.0

# Default disk temperature model constants (reference: raytracer.c:224).
DISK_TEMP_BASE_K = 2000.0
DISK_TEMP_RANGE_K = 18000.0

# API version of this framework.
VERSION_MAJOR = 0
VERSION_MINOR = 1
VERSION_PATCH = 0

"""Physical constants shared across the framework.

The reference fixes the speed of light at 2.998e8 m/s (empic.js:27) and uses
mu0 = 1.25663706e-6 in the Biot-Savart kernels (empic.js:314, 402).  We keep the
same truncated values so that normalized quantities match the reference
bit-for-bit at f32 precision; CODATA values are also exported for the
non-parity (modern) code paths.
"""

# Reference-truncated values (parity with empic.js:27,314)
SPEED_OF_LIGHT = 2.998e8          # m/s, empic.js:27
MU_0 = 1.25663706e-6              # T*m/A, empic.js:314
PI = 3.14159265359                # empic.js:314 (GLSL literal)

# CODATA-2018 values for modern paths
C_EXACT = 299792458.0
MU0_EXACT = 1.25663706212e-6
EPS0 = 8.8541878128e-12
ELEMENTARY_CHARGE = 1.602176634e-19
ELECTRON_MASS = 9.1093837015e-31
PROTON_MASS = 1.67262192369e-27
BOLTZMANN = 1.380649e-23

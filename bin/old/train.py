# The reference ships this file empty (0 bytes); kept for surface parity.

from .hll import HLL, estimate_from_registers, registers_from_hashes, rho64

__all__ = ["HLL", "estimate_from_registers", "registers_from_hashes", "rho64"]

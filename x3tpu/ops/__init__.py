"""Lane-parallel compute primitives: bit I/O, arithmetic coding, matching."""

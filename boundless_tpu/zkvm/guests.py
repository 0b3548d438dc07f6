"""Built-in guest programs (assembled in-repo).

Counterparts of the reference's test guests (`crates/guest/util`: echo,
identity, loop — reference `echo/src/main.rs:19-26`, `loop/src/main.rs:17-34`,
`identity/src/main.rs:27-37`) and the bento `sample-guest` iteration loads.
"""

from __future__ import annotations

from . import asm
from .executor import MemoryImage

# echo: journal := entire input, then halt 0.
ECHO_SRC = """
start:
    li a0, 0x10000      # input buffer
    li a1, 4096
    li t0, 2            # READ
    ecall
    mv a1, a0           # bytes read
    li a0, 0x10000
    li t0, 1            # COMMIT
    ecall
    li t0, 0            # HALT
    li a0, 0
    ecall
"""

# loop: read a 4-byte LE count, spin that many iterations, commit the count.
LOOP_SRC = """
start:
    li a0, 0x10000
    li a1, 4
    li t0, 2            # READ count
    ecall
    li t1, 0x10000
    lw t2, 0(t1)        # iterations
    li t3, 0
spin:
    beq t3, t2, done
    addi t3, t3, 1
    j spin
done:
    li a0, 0x10000
    li a1, 4
    li t0, 1            # COMMIT the count
    ecall
    li t0, 0
    li a0, 0
    ecall
"""

# identity: read a 32-byte claim digest, VERIFY it (assumption), commit it.
IDENTITY_SRC = """
start:
    li a0, 0x10000
    li a1, 32
    li t0, 2            # READ digest
    ecall
    li a0, 0x10000
    li t0, 4            # VERIFY (add assumption)
    ecall
    li a0, 0x10000
    li a1, 32
    li t0, 1            # COMMIT digest
    ecall
    li t0, 0
    li a0, 0
    ecall
"""

# busy multiply guest exercising the M extension.
MULDIV_SRC = """
start:
    li a0, 0x10000
    li a1, 8
    li t0, 2            # READ two u32 LE
    ecall
    li t1, 0x10000
    lw a2, 0(t1)
    lw a3, 4(t1)
    mul a4, a2, a3
    mulhu a5, a2, a3
    divu a6, a2, a3
    remu a7, a2, a3
    sw a4, 0(t1)
    sw a5, 4(t1)
    sw a6, 8(t1)
    sw a7, 12(t1)
    li a0, 0x10000
    li a1, 16
    li t0, 1            # COMMIT results
    ecall
    li t0, 0
    li a0, 0
    ecall
"""


def build(src: str, base: int = 0x1000) -> MemoryImage:
    words, _ = asm.assemble(src, base=base)
    return MemoryImage.from_words(words, base=base)


def echo() -> MemoryImage:
    return build(ECHO_SRC)


def loop_guest() -> MemoryImage:
    return build(LOOP_SRC)


def identity() -> MemoryImage:
    return build(IDENTITY_SRC)


def muldiv() -> MemoryImage:
    return build(MULDIV_SRC)

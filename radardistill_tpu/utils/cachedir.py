"""Machine-keyed XLA CPU compile-cache directories.

JAX's persistent compilation cache stores XLA:CPU AOT executables keyed by
HLO + compiler version, NOT by host CPU features. Loading an entry compiled
on a machine with a different feature set logs
``cpu_aot_loader: ... could lead to execution errors such as SIGILL`` and
can produce genuinely broken executables — observed in this repo as an
all-gather rendezvous deadlock in the 8-virtual-device dryrun after the
build machine changed between rounds (one thread at collective op_id=107,
seven at op_id=1, 40 s termination timeout, Check failure).

Fix: segregate CPU cache entries per machine by hashing the stable CPU
feature flags into the directory name. TPU caches don't need this (the
executable targets the TPU, not the host).
"""

import hashlib
import os


#: cpuinfo keys that identify the microarchitecture. Flags ALONE are not
#: enough: VM-masked feature flags can be bit-identical across different
#: physical CPU generations (observed r3: two fleet hosts, both
#: "Intel(R) Xeon(R) Processor @ 2.10GHz" with identical flags, hashed to
#: the same tag — the foreign AOT entries then reproduced the op_id=107
#: all-gather rendezvous abort). LLVM's host-CPU detection keys off
#: vendor/family/model/stepping, so the tag must too.
_ID_KEYS = (
    "vendor_id",
    "cpu family",
    "model",
    "model name",
    "stepping",
    "microcode",
    "flags",
    "bugs",
    "cpuid level",
    "address sizes",
)


def _tag_from_cpuinfo(text: str) -> str:
    """Hash the identity lines of the FIRST processor block of ``text``."""
    ident = []
    for line in text.splitlines(keepends=True):
        if not line.strip():
            break  # end of the first processor block
        key = line.split(":", 1)[0].strip()
        if key in _ID_KEYS:
            ident.append(line)
    if not ident:
        raise ValueError("no identity lines found")
    return hashlib.sha1("".join(ident).encode()).hexdigest()[:10]


def machine_tag() -> str:
    """Short stable fingerprint of this host's CPU identity."""
    try:
        with open("/proc/cpuinfo") as f:
            return _tag_from_cpuinfo(f.read())
    except (OSError, ValueError):
        pass
    import platform

    return hashlib.sha1(
        (platform.machine() + platform.processor()).encode()
    ).hexdigest()[:10]


def cpu_cache_dir(base: str) -> str:
    """Machine-keyed subdirectory of ``base`` for XLA:CPU cache entries."""
    return os.path.join(base, machine_tag())

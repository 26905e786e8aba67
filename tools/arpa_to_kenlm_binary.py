"""Convert an ARPA language model to KenLM's PROBING binary format.

Usage: python tools/arpa_to_kenlm_binary.py model.arpa kenlm-model.binary

The output loads through the same native reader the beam decoder uses
(speecht_tpu/native/kenlm_binary.cpp), and through KenLM itself — the
format follows lm/binary_format.cc (magic/sanity header, fixed-width
parameters, probing vocabulary + n-gram hash tables, embedded word
strings). `speecht-cli evaluate --language-model <dir>` picks up a
`*.binary` in the directory automatically (reference bundle layout,
speecht-cli:84-88).
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main(argv):
    if len(argv) != 2:
        print(__doc__)
        return 1
    from speecht_tpu import native

    native.lm_write_binary(argv[0], argv[1])
    print(f"wrote {argv[1]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))

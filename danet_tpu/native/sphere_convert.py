#!/usr/bin/env python
"""CLI: convert a NIST SPHERE file to RIFF WAV using the native decoder.

Drop-in for the `sndfile-convert` / `sph2pipe -f rif` steps of the dataset
install scripts. Usage: python sphere_convert.py in.sph out.wav
"""
import sys


def main():
    if len(sys.argv) != 3:
        print("usage: sphere_convert.py <in.sph> <out.wav>")
        return 1
    import scipy.io.wavfile
    from danet_tpu.native.sphere import read_sphere
    rate, data = read_sphere(sys.argv[1])
    scipy.io.wavfile.write(sys.argv[2], rate, data)
    return 0


if __name__ == "__main__":
    import os
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".."))
    sys.exit(main())

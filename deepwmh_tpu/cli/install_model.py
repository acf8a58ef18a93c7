"""DeepWMH_install — unpack a released model package.

Counterpart of the reference installer (deepwmh/main/install_model.py:53-109).
Our packages are relocatable (no pickled paths), so install = extract +
validate.
"""

from __future__ import annotations

import argparse

from deepwmh_tpu.unet.release import install_model, validate_model_dir


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Install a released DeepWMH-TPU model (tar.gz).",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("-i", "--input", type=str, required=True,
                        help="Path to model_release.tar.gz")
    parser.add_argument("-o", "--output-folder", type=str, required=True,
                        help="Installation target directory.")
    args = parser.parse_args(argv)
    dest = install_model(args.input, args.output_folder)
    validate_model_dir(dest)
    print("Model installed to: %s" % dest)
    print('Use it with: DeepWMH_predict -m "%s" ...' % dest)


if __name__ == "__main__":
    main()

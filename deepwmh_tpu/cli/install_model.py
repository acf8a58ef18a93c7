"""DeepWMH_install — unpack a released model package.

Counterpart of the reference installer (deepwmh/main/install_model.py:53-109),
including its flag surface (-m/--model-targz, -o, -f/--force) and its
refuse-to-install-into-a-non-empty-directory guard (install_model.py:74-79).
Our packages are relocatable (no pickled paths), so install = extract +
validate — the reference's pickle path-rewriting step has no equivalent here.
`-i/--input` is kept as an alias of `-m` for earlier repo versions.
"""

from __future__ import annotations

import argparse
import os

from deepwmh_tpu.unet.release import install_model, validate_model_dir


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Install a released DeepWMH-TPU model (tar.gz).",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("-m", "--model-targz", "-i", "--input", dest="input",
                        type=str, required=True,
                        help="Pre-trained model file (in *.tar.gz format).")
    parser.add_argument("-o", "--install-location", "--output-folder",
                        dest="output_folder", type=str, required=True,
                        help="Model install location.")
    parser.add_argument("-f", "--force", action="store_true",
                        help="Overwrite if model already exists.")
    args = parser.parse_args(argv)

    dest = args.output_folder
    if os.path.isdir(dest) and len(os.listdir(dest)) > 0:
        if not args.force:
            raise SystemExit(
                "Model can be only installed in an empty directory! "
                'Add "-f" to overwrite existing model (not recommended).')
        print("WARNING: overwriting previously installed model...")
    dest = install_model(args.input, dest)
    validate_model_dir(dest)
    print("Model installed to: %s" % dest)
    print('Use it with: DeepWMH_predict -m "%s" ...' % dest)


if __name__ == "__main__":
    main()

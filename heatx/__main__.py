import sys

from heatx.cli import main

sys.exit(main())

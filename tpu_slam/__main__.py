from tpu_slam.cli import main

raise SystemExit(main())

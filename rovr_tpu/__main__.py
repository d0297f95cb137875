from rovr_tpu.cli import main

raise SystemExit(main())

from turboinfer_tpu.cli import main

raise SystemExit(main())

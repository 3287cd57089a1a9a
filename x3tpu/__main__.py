from x3tpu.cli import main

raise SystemExit(main())

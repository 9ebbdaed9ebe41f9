from littlegan_tpu.cli import main

raise SystemExit(main())

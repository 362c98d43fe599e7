from gmvae_tpu.cli import main

raise SystemExit(main())

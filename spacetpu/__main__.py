from spacetpu.main import main

main()

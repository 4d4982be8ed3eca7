#!/usr/bin/env perl
# Shuffle stdin lines with a seedable RNG (fresh implementation of the
# Kaldi utils/shuffle_list.pl contract):
#   shuffle_list.pl [--srand N] < in > out

use strict;
use warnings;

my $seed = 0;
if (@ARGV >= 1 and $ARGV[0] eq "--srand") {
    shift;
    $seed = shift;
}
srand($seed);

my @lines = <STDIN>;
for (my $i = $#lines; $i > 0; $i--) {
    my $j = int(rand($i + 1));
    @lines[$i, $j] = @lines[$j, $i];
}
print @lines;

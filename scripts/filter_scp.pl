#!/usr/bin/env perl
# Keep lines of stdin whose key appears in an id-list file (fresh
# implementation of the Kaldi utils/filter_scp.pl contract):
#   filter_scp.pl [-f 1] id_list < in.scp > out.scp
# -f N selects which field of stdin is the key (1-based, default 1).

use strict;
use warnings;

my $field = 1;
if (@ARGV >= 2 and $ARGV[0] eq "-f") {
    shift;
    $field = shift;
}
my $id_list = shift or die "filter_scp.pl: usage: filter_scp.pl [-f N] ids\n";

my %keep;
open(my $fh, "<", $id_list) or die "filter_scp.pl: cannot open $id_list\n";
while (<$fh>) {
    my @a = split;
    $keep{$a[0]} = 1 if @a;
}
close $fh;

while (<STDIN>) {
    my @a = split;
    next unless @a >= $field;
    print if $keep{$a[$field - 1]};
}

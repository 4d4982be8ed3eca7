#!/usr/bin/env perl
# Map integer sequences to symbols using a symbol table (fresh
# implementation of the Kaldi utils/int2sym.pl contract):
#   int2sym.pl [-f 2-] <symtab> < int-text > sym-text
# -f N- applies the mapping from field N on (1-based), leaving earlier
# fields (utterance ids) untouched.

use strict;
use warnings;

my $field_start = 1;
if (@ARGV and $ARGV[0] eq "-f") {
    shift;
    my $spec = shift;
    if ($spec =~ m/^(\d+)-$/) { $field_start = $1; }
    elsif ($spec =~ m/^(\d+)$/) { $field_start = $1; }
    else { die "int2sym.pl: bad field spec $spec\n"; }
}
my $symtab = shift or die "int2sym.pl: usage: int2sym.pl [-f 2-] symtab\n";

my %int2sym;
open(my $fh, "<", $symtab) or die "int2sym.pl: cannot open $symtab\n";
while (<$fh>) {
    my @a = split;
    next unless @a == 2;
    $int2sym{$a[1]} = $a[0];
}
close $fh;

while (<STDIN>) {
    my @a = split;
    for my $i (($field_start - 1) .. $#a) {
        if (defined $int2sym{$a[$i]}) {
            $a[$i] = $int2sym{$a[$i]};
        } else {
            die "int2sym.pl: undefined integer $a[$i]\n";
        }
    }
    print join(" ", @a), "\n";
}
